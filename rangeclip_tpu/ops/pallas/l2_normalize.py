"""Fused channel L2-normalization of the pixel-embedding field (Pallas TPU).

Reference semantics: decoder.py:113-116 / torch F.normalize —
y = x / max(||x||_2, eps) over the channel dim (utils/math.l2_normalize).

XLA schedules the normalize as a reduce pass (sum x^2) plus a multiply
pass, and its autodiff backward as a multiply-reduce (sum g*x) plus a
combine pass — each pass streaming the full [B, H, W, D] field through
HBM (the ~2.4 ms broadcast_multiply and 4.3 ms multiply_reduce fusions in
the 1x32 @ 256^2 bf16 step profile).  Per-pixel norms are a LANE-dim
reduction over D, so one Pallas pass can do reduce + scale in VMEM:

  * forward: read an x tile, accumulate sum(x^2) per row in f32, write
    y = x / max(norm, eps) — one read + one write of the field;
  * backward: read x and g tiles, recompute the norm in-register (cheaper
    than a second residual stream), write
      dx = g / m - [n >= eps] * (sum(g*x) / (m^2 * n)) * x,   m = max(n, eps)
    — the exact VJP of the forward expression (including the max()
    subgradient), one read of each input + one write.

The custom VJP saves x as its only residual — exactly what XLA's autodiff
keeps — so the train step's loop residuals are unchanged.

Accepts the [B, H, W, D] field directly (CE-kernel-style 4-D blocks,
pixel_text_ce.py) or flat [N, D] rows.  f32 accumulation in both modes;
in fp32 the only difference vs the XLA formulation is reduction order
(bitwise parity vs torch is a CPU-path property, tests/
test_reference_parity.py).  Dispatched at the decoder head
(models/decoder.py) behind ``use_tpu_kernels()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12


def _fwd_kernel(x_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)
    rows = x.reshape(-1, x.shape[-1])  # merge leading block dims (allowed)
    n = jnp.sqrt(jnp.sum(rows * rows, axis=-1, keepdims=True))
    y = rows / jnp.maximum(n, EPS)
    y_ref[...] = y.reshape(x_ref.shape).astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32).reshape(-1, x_ref.shape[-1])
    g = g_ref[...].astype(jnp.float32).reshape(-1, g_ref.shape[-1])
    s = jnp.sum(x * x, axis=-1, keepdims=True)
    n = jnp.sqrt(s)
    m = jnp.maximum(n, EPS)
    t = jnp.sum(g * x, axis=-1, keepdims=True)
    # d(max(n, eps))/dn = [n >= eps]; the safe denominator keeps the
    # masked branch finite (m^2 * max(n, eps) >= eps^3 > 0 in f32).
    factor = jnp.where(n >= EPS, t / (m * m * jnp.maximum(n, EPS)), 0.0)
    dx = g / m - x * factor
    dx_ref[...] = dx.reshape(x_ref.shape).astype(dx_ref.dtype)


def _specs(x, rows_target=2048):
    """(grid, block_spec) shared by fwd/bwd; 4-D fields use CE-style
    (1, rh, W, D) blocks, flat inputs (tile, D) row blocks."""
    if x.ndim == 4:
        B, H, W, D = x.shape
        if W % 8 or D % 128:
            raise ValueError(
                f"fused_l2_normalize: field shape {x.shape} needs W % 8 "
                f"== 0 and D % 128 == 0 — use utils.math.l2_normalize")
        rh = max(rows_target // W, 1)
        while H % rh:
            rh -= 1
        hb = H // rh
        return (
            (B * hb,),
            pl.BlockSpec((1, rh, W, D), lambda i, hb=hb: (i // hb, i % hb, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    n, D = x.shape
    if n % 8 or D % 128:
        raise ValueError(
            f"fused_l2_normalize: flat shape {x.shape} needs N % 8 == 0 "
            f"and D % 128 == 0 — use utils.math.l2_normalize")
    tile = rows_target
    while n % tile:
        tile //= 2
    return (
        (n // tile,),
        pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_l2_normalize(x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = x / max(||x||_2(channel), eps) — x is [B, H, W, D] or [N, D].

    Requires D a multiple of 128 and (4-D) W a multiple of 8 or (flat) N a
    multiple of 8 — the field shapes the decoder produces.  Callers with
    other shapes use the XLA ``utils.math.l2_normalize``.
    """
    return _run(_fwd_kernel, (x,), x.dtype, interpret)


def _run(kernel, args, out_dtype, interpret):
    x = args[0]
    # Largest-valid-tile rule (ops/pallas/score_topk.py lesson), bounded by
    # the ~16 MB VMEM budget incl. double buffering and f32 upcasts: the
    # 2-operand backward at 2048 rows measures 17.2 MB and is rejected by
    # Mosaic, so it halves the tile.
    grid, spec = _specs(x, rows_target=2048 if len(args) == 1 else 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        interpret=interpret,
    )(*args)


def _fwd(x, interpret):
    return fused_l2_normalize(x, interpret), x


def _bwd(interpret, x, g):
    return (_run(_bwd_kernel, (x, g), x.dtype, interpret),)


fused_l2_normalize.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Layout-absorbing field variant
# ---------------------------------------------------------------------------
# XLA emits the decoder's output conv in layout {3,0,2,1} (memory order
# h, w, B, D — CLAUDE.md round-2 lesson), but Pallas operands must be
# standard-layout, so feeding the [B, h, w, D] field to the plain kernel
# above makes XLA insert an explicit relayout copy first (measured: the
# copy eats the fusion win, experiments/l2norm_ab.py).  This variant
# absorbs the relayout INTO the kernel: it reads the field through the
# free [h, w, B, D] transpose relabel (bitcast of the conv's layout) and
# writes standard [B, h, w, D] blocks with an in-register (w, B) tile
# transpose — one read + one write, relayout included.  The backward
# mirrors it: cotangents arrive standard (from the CE/TV/pooling
# backwards), dx leaves through the relabel so the conv backward gets its
# preferred layout for free.


def _fwd_kernel_t(xt_ref, y_ref):
    xt = xt_ref[...]  # (1, wb, B, D)
    _, wb, Bn, D = xt.shape
    rows = xt.astype(jnp.float32).reshape(wb * Bn, D)
    n = jnp.sqrt(jnp.sum(rows * rows, axis=-1, keepdims=True))
    y = rows / jnp.maximum(n, EPS)
    y_ref[...] = (y.reshape(wb, Bn, D).transpose(1, 0, 2)
                  .reshape(Bn, 1, wb, D).astype(y_ref.dtype))


def _bwd_kernel_t(xt_ref, g_ref, dx_ref):
    xt = xt_ref[...]
    _, wb, Bn, D = xt.shape
    x = xt.astype(jnp.float32).reshape(wb * Bn, D)
    g = (g_ref[...].astype(jnp.float32).reshape(Bn, wb, D)
         .transpose(1, 0, 2).reshape(wb * Bn, D))
    s = jnp.sum(x * x, axis=-1, keepdims=True)
    n = jnp.sqrt(s)
    m = jnp.maximum(n, EPS)
    t = jnp.sum(g * x, axis=-1, keepdims=True)
    factor = jnp.where(n >= EPS, t / (m * m * jnp.maximum(n, EPS)), 0.0)
    dx = g / m - x * factor
    dx_ref[...] = dx.reshape(1, wb, Bn, D).astype(dx_ref.dtype)


def field_kernel_applicable(shape) -> bool:
    """[B, h, w, D] shapes the field variant supports: sublane/lane
    divisibility for both block orientations, plus a valid VMEM tile for
    BOTH passes (the 2-operand backward's 1024-row budget is the tighter
    one — B > 128 would need a sub-8 w-tile, so such batches fall back
    to the XLA formulation instead of failing Mosaic compilation)."""
    if len(shape) != 4:
        return False
    B, _, W, D = shape
    return (B % 8 == 0 and W % 8 == 0 and D % 128 == 0
            and _pick_wb(W, B, n_ops=2) is not None)


def _pick_wb(W: int, B: int, n_ops: int):
    """Largest w-tile that divides W, is a multiple of 8 (the out block's
    sublane dim), and keeps n_ops + 1 blocks under the VMEM budget.
    Returns None when no such tile exists (caller must fall back)."""
    budget_rows = 2048 if n_ops == 1 else 1024
    wb = min(budget_rows // B, W) // 8 * 8
    while wb >= 8:
        if W % wb == 0:
            return wb
        wb -= 8
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_l2_normalize_field(x: jax.Array, interpret: bool = False
                             ) -> jax.Array:
    """Channel L2-normalize of the [B, h, w, D] field, reading through the
    conv's native {3,0,2,1} layout (no input relayout) and emitting the
    standard layout downstream consumers want."""
    return _field_fwd_run(x, interpret)


def _field_fwd_run(x, interpret):
    B, H, W, D = x.shape
    wb = _pick_wb(W, B, n_ops=1)
    if wb is None:
        raise ValueError(
            f"fused_l2_normalize_field: no valid w-tile for shape "
            f"{x.shape} — gate calls on field_kernel_applicable()")
    xt = jnp.transpose(x, (1, 2, 0, 3))
    return pl.pallas_call(
        _fwd_kernel_t,
        grid=(H, W // wb),
        in_specs=[pl.BlockSpec((1, wb, B, D), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 1, wb, D), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        interpret=interpret,
    )(xt)


def _field_fwd(x, interpret):
    return _field_fwd_run(x, interpret), x


def _field_bwd(interpret, x, g):
    B, H, W, D = x.shape
    wb = _pick_wb(W, B, n_ops=2)
    if wb is None:
        raise ValueError(
            f"fused_l2_normalize_field backward: no valid w-tile for "
            f"shape {x.shape} — gate calls on field_kernel_applicable()")
    xt = jnp.transpose(x, (1, 2, 0, 3))
    dx_t = pl.pallas_call(
        _bwd_kernel_t,
        grid=(H, W // wb),
        in_specs=[
            pl.BlockSpec((1, wb, B, D), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, wb, D), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wb, B, D), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, B, D), x.dtype),
        interpret=interpret,
    )(xt, g)
    return (jnp.transpose(dx_t, (2, 0, 1, 3)),)


fused_l2_normalize_field.defvjp(_field_fwd, _field_bwd)
