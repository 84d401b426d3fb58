"""Partitioning rules for the Pallas-kernel dispatch under a sharded mesh.

``pallas_call`` is a single-device program: GSPMD has no partitioning rule
for it, so jitting a kernel over 'data'/'spatial'-sharded operands would
force the operands replicated (a silent all-gather) — or fail outright —
on a real multi-chip mesh.  Every kernel dispatch site in the losses and
the model therefore routes through this module: when the AMBIENT abstract
mesh (``jax.sharding.set_mesh``, established by the train step / trainer)
has non-trivial, non-Manual axes, the kernel call is wrapped in
``jax.shard_map`` with explicit specs — each device runs the kernel on its
local shard and the scalar/table outputs are combined with explicit
collectives.  When no mesh is set (single-chip bench/serve/infer), when
the mesh axes are trivial, or inside an enclosing ``shard_map`` (axes
already Manual — the ``--ddp_parity`` step and the sharded predict,
parallel/predict.py), the kernel is called directly on what are already
local shards.

Partitioning story per mesh axis (parallel/mesh.py):

  * 'data' / 'spatial' — the batch and image-height axes.  Every fused
    kernel is row-parallel over pixels, so these axes shard the kernel's
    pixel rows; CE / class-presence / TV / masked-pooling emit per-shard
    partial sums combined with one scalar- or [C]-sized ``psum``.
    Labels/weights in the flat ``[S, N]`` slot layout are re-expressed as
    ``[S, B, h, w]`` OUTSIDE the shard_map so their shards line up with
    the field's (a jointly-flattened ``[S, N]`` axis would NOT: contiguous
    flat chunks mix whole images with row blocks unless B/n_data == 1).
  * 'model' — the class axis.  The fused kernels keep each [rows, C]
    score tile in VMEM and never materialize [N, C] in HBM, so there is
    no memory win from sharding C inside a kernel; the class tables ride
    in REPLICATED (in_specs ``P()``), and shard_map inserts the
    all-gather when the caller stored them 'model'-sharded.  The tables
    are C- or K-row ([C, D] f32 at C=512 is 1 MB); gathering them once
    per step is noise next to the field traffic.  'model'-sharded SCORING
    exists where it pays — the [N, S] serving path (parallel/predict.py
    local-top-k + exact cross-shard merge).
  * TV under a non-trivial 'spatial' axis falls back to the XLA
    formulation: vertical neighbor differences cross the shard boundary,
    and GSPMD's automatic halo exchange on the XLA form is the right tool
    (the kernel would need a manual ppermute halo for ~zero win — TV is
    ~13% of the step and the halo is one image row).

The sharded kernel path is proven against the sharded XLA path and the
single-device path in tests/test_parallel.py (interpret-mode kernels on
the 8-virtual-device CPU mesh), and exercised by ``__graft_entry__``'s
dryrun so the driver artifact certifies it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_KERNEL_AXES = ("data", "spatial", "model")


def ambient_kernel_axes():
    """(abstract_mesh, {axis: size}) for the ambient mesh's non-Manual,
    size>1 kernel axes; ({}, {}) shape when no mesh is set.

    Manual axes (inside an enclosing shard_map — ddp_parity, sharded
    predict) are excluded: there the kernel already sees local shards.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return None, {}
    sizes = {}
    manual = jax.sharding.AxisType.Manual
    for name, ty in zip(am.axis_names, am.axis_types):
        if name in _KERNEL_AXES and am.shape[name] > 1 and ty != manual:
            sizes[name] = am.shape[name]
    return am, sizes


def field_shard_axes(batch: int, height: Optional[int] = None
                     ) -> Tuple[Optional[object], Tuple[str, ...]]:
    """(abstract_mesh, axes) a [B, h, ...] kernel operand shards over:
    'data' when it divides ``batch``, 'spatial' when ``height`` is given
    and divisible.  Empty axes tuple -> call the kernel directly."""
    am, sizes = ambient_kernel_axes()
    axes = []
    if "data" in sizes and batch % sizes["data"] == 0:
        axes.append("data")
    if (height is not None and "spatial" in sizes
            and height % sizes["spatial"] == 0):
        axes.append("spatial")
    return am, tuple(axes)


def local_field_shape(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """The PER-DEVICE shape of a [B, h, w, D] field under the ambient mesh
    — what per-shard kernel applicability gates must check.  Dims that do
    not divide evenly are returned unchanged (that axis is not sharded by
    the dispatch wrappers)."""
    am, sizes = ambient_kernel_axes()
    if not sizes:
        return tuple(shape)
    out = list(shape)
    nd = sizes.get("data", 1)
    ns = sizes.get("spatial", 1)
    if len(out) >= 1 and out[0] % nd == 0:
        out[0] //= nd
    if len(out) >= 2 and out[1] % ns == 0:
        out[1] //= ns
    return tuple(out)


def _field_specs(axes):
    d = "data" if "data" in axes else None
    s = "spatial" if "spatial" in axes else None
    return d, s


def sharded_ce_sum(ce_body, samples, labels, valid, *extras):
    """Partition a pixel-text-CE kernel call over the ambient mesh.

    ``ce_body(samples, labels [S, N], valid [S, N], *extras) -> scalar``
    is the single-device kernel formulation (possibly a packed/full
    lax.cond pair).  ``samples`` must be the [B, h, w, D] field for the
    sharded path (flat [N, D] samples dispatch directly — they carry no
    shard-alignable batch structure).  ``extras`` (temperature, tables,
    masks, traced counts) are replicated into every shard.
    """
    labels2 = labels if labels.ndim == 2 else labels[None]
    valid2 = valid if valid.ndim == 2 else valid[None]
    if samples.ndim != 4:
        return ce_body(samples, labels2, valid2, *extras)
    B, h, w, _ = samples.shape
    am, axes = field_shard_axes(B, h)
    if not axes:
        return ce_body(samples, labels2, valid2, *extras)
    S = labels2.shape[0]
    labels4 = labels2.reshape(S, B, h, w)
    valid4 = valid2.reshape(S, B, h, w)
    d, s = _field_specs(axes)
    fspec = P(d, s, None, None)
    lspec = P(None, d, s, None)

    def body(samples, labels4, valid4, *extras):
        S_, Bl, hl, wl = labels4.shape
        ce = ce_body(samples, labels4.reshape(S_, Bl * hl * wl),
                     valid4.reshape(S_, Bl * hl * wl), *extras)
        return jax.lax.psum(ce, axes)

    return jax.shard_map(
        body, mesh=am,
        in_specs=(fspec, lspec, lspec) + (P(),) * len(extras),
        out_specs=P(), check_vma=False,
    )(samples, labels4, valid4, *extras)


def sharded_class_presence(labels, valid, num_classes: int,
                           interpret: bool = False):
    """[C] presence mask from labels/valid of shape [S, B, h, w],
    [B, h, w], or flat [N] — field-shaped inputs shard over
    'data'/'spatial' with a psum-OR; flat inputs dispatch directly."""
    from rangeclip_tpu.ops.pallas.class_presence import fused_class_presence

    if labels.ndim == 3:
        labels, valid = labels[None], valid[None]
    if labels.ndim != 4:
        return fused_class_presence(labels.reshape(-1), valid.reshape(-1),
                                    num_classes, interpret=interpret)
    S, B, h, w = labels.shape
    am, axes = field_shard_axes(B, h)
    if not axes:
        return fused_class_presence(labels.reshape(-1), valid.reshape(-1),
                                    num_classes, interpret=interpret)
    d, s = _field_specs(axes)
    spec = P(None, d, s, None)

    def body(labels, valid):
        p = fused_class_presence(labels.reshape(-1), valid.reshape(-1),
                                 num_classes, interpret=interpret)
        return jax.lax.psum(p.astype(jnp.float32), axes) > 0

    return jax.shard_map(body, mesh=am, in_specs=(spec, spec),
                         out_specs=P(), check_vma=False)(labels, valid)


def sharded_histogram(idx, n_bins: int, interpret: bool = False):
    """Per-image draw histogram [B, n_bins] sharded over 'data' (rows are
    independent per image — no collective)."""
    from rangeclip_tpu.ops.pallas.histogram import fused_histogram

    am, axes = field_shard_axes(idx.shape[0])
    if "data" not in axes:
        return fused_histogram(idx, n_bins, interpret=interpret)

    def body(idx):
        return fused_histogram(idx, n_bins, interpret=interpret)

    return jax.shard_map(body, mesh=am, in_specs=(P("data", None),),
                         out_specs=P("data", None), check_vma=False)(idx)


def sharded_tv_rowtile(x, sample_weight, upsample: int,
                       interpret: bool = False):
    """Row-tile TV kernel over a 'data'-sharded batch (per-shard losses
    average exactly to the global: equal shard sizes, identical scale
    factors).  Returns None when the ambient mesh has a non-trivial
    'spatial' axis — vertical differences cross the H-shard boundary, and
    the caller must use the XLA formulation (GSPMD inserts the halo
    exchange there automatically)."""
    from rangeclip_tpu.ops.pallas.tv_rowtile import tv_rowtile

    am, sizes = ambient_kernel_axes()
    if sizes.get("spatial", 1) > 1:
        return None
    nd = sizes.get("data", 1)
    B = x.shape[0]
    if nd <= 1 or B % nd:
        return tv_rowtile(x, sample_weight, upsample, interpret)
    w = (jnp.ones((B,), jnp.float32) if sample_weight is None
         else sample_weight)

    def body(x, w):
        local = tv_rowtile(x, w, upsample, interpret)
        return jax.lax.psum(local, "data") / nd

    return jax.shard_map(
        body, mesh=am, in_specs=(P("data", None, None, None), P("data")),
        out_specs=P(), check_vma=False,
    )(x, w)


def sharded_l2_normalize_field(x, interpret: bool = False):
    """Layout-absorbing field L2-normalize over 'data'/'spatial' shards
    (elementwise per pixel row — no collective).  Callers gate on
    ``field_kernel_applicable(local_field_shape(x.shape))``."""
    from rangeclip_tpu.ops.pallas.l2_normalize import fused_l2_normalize_field

    B, h = x.shape[0], x.shape[1]
    am, axes = field_shard_axes(B, h)
    if not axes:
        return fused_l2_normalize_field(x, interpret)
    d, s = _field_specs(axes)
    spec = P(d, s, None, None)
    return jax.shard_map(
        lambda x: fused_l2_normalize_field(x, interpret),
        mesh=am, in_specs=(spec,), out_specs=spec, check_vma=False,
    )(x)


def sharded_masked_pooling(emb, seg, object_indices, interpret: bool = False):
    """Batch-global masked pooling partials: (sums [N, D], counts [N])
    psum'd over 'data'/'spatial' shards of the [B, H, W, D] field."""
    from rangeclip_tpu.ops.pallas.masked_pooling import fused_masked_pooling

    B, H, W, D = emb.shape
    am, axes = field_shard_axes(B, H)
    if not axes:
        return fused_masked_pooling(
            emb.reshape(B * H * W, D).astype(jnp.float32),
            seg.reshape(B * H * W), object_indices, interpret=interpret)
    d, s = _field_specs(axes)
    fspec = P(d, s, None, None)
    sspec = P(d, s, None)

    def body(emb, seg, object_indices):
        Bl, Hl, Wl, Dl = emb.shape
        sums, counts = fused_masked_pooling(
            emb.reshape(Bl * Hl * Wl, Dl).astype(jnp.float32),
            seg.reshape(Bl * Hl * Wl), object_indices, interpret=interpret)
        return (jax.lax.psum(sums, axes), jax.lax.psum(counts, axes))

    return jax.shard_map(
        body, mesh=am, in_specs=(fspec, sspec, P()),
        out_specs=(P(), P()), check_vma=False,
    )(emb, seg, object_indices)
