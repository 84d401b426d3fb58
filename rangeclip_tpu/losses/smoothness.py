"""Total-variation smoothness regularizer.

Reference: model.py:329-334 — L1 distance between horizontally and
vertically adjacent pixel embeddings (torch F.l1_loss => mean reduction),
summed over the two directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def total_variation_loss(
    pixel_embeddings: jax.Array,
    upsample: int = 1,
    sample_weight: jax.Array = None,
) -> jax.Array:
    """pixel_embeddings: [B, H, W, D] (NHWC).

    ``sample_weight``: optional [B] 0/1 weights excluding padded batch
    items (fixed-shape final batches pad with sample_valid=0 duplicates).
    Implemented as TV(x * w) * B/sum(w): zero items contribute zero
    variation and zero gradient, and the rescale makes the value the exact
    reference TV of the valid sub-batch.  With all-ones weights both the
    multiply (x*1) and the rescale (*1.0) are bitwise identities, so the
    weighted path is BIT-IDENTICAL to the unweighted one on full batches.
    Weights are assumed 0/1 (a fractional weight would scale the field
    inside the |.|, not the loss).

    Differences/abs run in the input dtype (halving HBM traffic under the
    bf16 policy — this term is bandwidth-bound); the mean accumulates in
    fp32 either way.  fp32 inputs -> bit-identical to the fp32 reference.

    ``upsample=s`` computes the EXACT TV of the nearest xs upsample of the
    input without materializing it: inside an sxs block all differences are
    zero, and each native cross-boundary difference appears s times per
    direction, so
      mean_full_h = mean_native_h * (W - 1) / (s*W - 1)   (W native width)
    and symmetrically for the vertical term.  Used by the native-resolution
    training mode (hybrid.py label_upsample).

    The BACKWARD is a hand-derived custom VJP: XLA's autodiff of the
    two-direction mean|diff| materializes four sign fields (two bf16
    [B, H, W-1, D]-sized tuples, ~2 GB of HBM writes at the canonical
    train config — the two 3.2 ms ``neg`` fusions in the step profile)
    and then re-reads them for the shifted adds.  The analytic gradient
      dx = gh * (pad_r(sign(dh)) - pad_l(sign(dh)))
         + gv * (pad_d(sign(dv)) - pad_u(sign(dv)))
    is one fused elementwise pass: read x at the four neighbor offsets,
    write the gradient once.  Same math as XLA's autodiff of jnp.abs
    (including the +1-at-ties convention), verified elementwise-equal in
    tests/test_losses.py.

    A fused Pallas formulation exists (ops/pallas/tv_loss.py, correct and
    grad-exact) but measured SLOWER than this XLA version at bf16 on v5e
    (fwd 7 vs 3.9 ms, bwd 16 vs 7.6 ms at 4x256^2x512 — the 2-D grid's
    small blocks are DMA-bound and the seam passes re-read the adjoint), so
    XLA stays the default; the kernel is kept as a benchmarked negative
    result and an opt-in for future hardware.

    Also measured and REJECTED (experiments/tv_bwd_ab.py, 32x128^2x512
    bf16 on v5e): a "one-pass" backward expressing the gradient directly
    in masked neighbor slopes of x (each pad feeding exactly one consumer,
    hoping XLA fuses the whole thing into one halo-read pass) — 12.15 vs
    9.72 ms, 25% SLOWER and bit-identical.  XLA materializes the four
    masked slope fields instead of two sign fields, so traffic goes UP;
    letting it CSE+materialize sh/sv is the better schedule.
    """
    from rangeclip_tpu.utils.platform import kernel_interpret, use_tpu_kernels
    from rangeclip_tpu.ops.pallas.tv_rowtile import kernel_applicable
    from rangeclip_tpu.parallel.kernel_shard import (
        local_field_shape, sharded_tv_rowtile,
    )

    scale = None
    if sample_weight is not None:
        scale = pixel_embeddings.shape[0] / jnp.maximum(
            jnp.sum(sample_weight.astype(jnp.float32)), 1.0
        )

    if use_tpu_kernels() and kernel_applicable(
        local_field_shape(pixel_embeddings.shape), pixel_embeddings.dtype
    ):
        # one-pass row-tile kernel (bf16 fields): weights fold in as
        # per-tile scalars — no x * w materialization, no sign fields.
        # Under a mesh the kernel runs per-'data'-shard with the per-shard
        # losses psum-averaged; a non-trivial 'spatial' axis returns None
        # (vertical pairs cross the H-shard boundary) and the XLA
        # formulation below takes over — GSPMD inserts its halo exchange
        # automatically (parallel/kernel_shard.py).
        loss = sharded_tv_rowtile(pixel_embeddings, sample_weight,
                                  int(upsample), interpret=kernel_interpret())
        if loss is not None:
            return loss if scale is None else loss * scale

    if sample_weight is not None:
        w = sample_weight.astype(pixel_embeddings.dtype)
        pixel_embeddings = pixel_embeddings * w[:, None, None, None]
        return _tv(pixel_embeddings, int(upsample)) * scale
    return _tv(pixel_embeddings, int(upsample))


def _tv_value(x: jax.Array, upsample: int) -> jax.Array:
    tv_h = jnp.mean(jnp.abs(x[:, :, :-1, :] - x[:, :, 1:, :]),
                    dtype=jnp.float32)
    tv_v = jnp.mean(jnp.abs(x[:, :-1, :, :] - x[:, 1:, :, :]),
                    dtype=jnp.float32)
    if upsample > 1:
        H, W = x.shape[1], x.shape[2]
        tv_h = tv_h * ((W - 1) / (upsample * W - 1))
        tv_v = tv_v * ((H - 1) / (upsample * H - 1))
    return tv_h + tv_v


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tv(x: jax.Array, upsample: int) -> jax.Array:
    return _tv_value(x, upsample)


def _tv_fwd(x, upsample):
    return _tv_value(x, upsample), x


def _tv_bwd(upsample, x, g):
    B, H, W, D = x.shape
    s = upsample
    gh = g / (B * H * (W - 1) * D)
    gv = g / (B * (H - 1) * W * D)
    if s > 1:
        gh = gh * ((W - 1) / (s * W - 1))
        gv = gv * ((H - 1) / (s * H - 1))
    # JAX's d|u|/du convention is u >= 0 ? +1 : -1 (+1 at exact ties, where
    # torch's sign-based backward gives 0) — kept so this VJP is elementwise
    # IDENTICAL to XLA's autodiff of the forward; ties are measure-zero on
    # real embeddings.
    #
    # Everything stays in the INPUT dtype: the forward differences run in
    # x.dtype (see the class docstring), so the exact-match slope is the
    # sign of the x.dtype difference — and ±1 is exact in bf16.  XLA
    # materializes sh/sv (each feeds two pads), so under the bf16 policy
    # this halves the two sign fields' HBM writes AND drops the f32 copy
    # of x that the old f32 formulation forced the train step to carry as
    # a loop residual (measured: the sign fusions were 2x 4.7 ms at 3.2 GB
    # accessed each, plus a 3.3 ms [B,H,W,D] f32 convert, on the
    # 32x128^2x512 step).  gh/gv stay f32 scalars (they carry the 1/N
    # scale); the combine promotes elementwise in-register.
    def slope(u):
        one = jnp.asarray(1, u.dtype)
        return jnp.where(u >= 0, one, -one)

    sh = slope(x[:, :, :-1, :] - x[:, :, 1:, :])  # [B, H, W-1, D], x.dtype
    sv = slope(x[:, :-1, :, :] - x[:, 1:, :, :])  # [B, H-1, W, D], x.dtype
    no = (0, 0)
    grad = (
        gh * (jnp.pad(sh, (no, no, (0, 1), no))
              - jnp.pad(sh, (no, no, (1, 0), no)))
        + gv * (jnp.pad(sv, (no, (0, 1), no, no))
                - jnp.pad(sv, (no, (1, 0), no, no)))
    )
    return (grad.astype(x.dtype),)


_tv.defvjp(_tv_fwd, _tv_bwd)
