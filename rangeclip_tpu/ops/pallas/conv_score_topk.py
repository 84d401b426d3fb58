"""Fused folded-head conv + top-k selection (round 5).

The folded predict path (models/depth_unet.py predict_folded) runs two
programs over HBM: an XLA 3x3 conv emitting the [N, S] candidate-score
field (1.6 GB bf16 at the bench config — written once), then the
score_topk selection kernel (read once).  The predict-side roofline
table (experiments/predict_roofline.py) puts the pair at 3.40 + 3.92 ms
with the conv at its im2col K-padding ceiling and the selection
VPU-bound at ~1.9x its byte floor — the score field's 3.2 GB round trip
is the only removable cost.  This kernel computes conv and selection in
one pass: the scores live only in VMEM, tile by tile, and the MXU's conv
work overlaps the VPU's selection work within each grid step.

Layout design (the part that makes it possible at full lane occupancy —
the all-Pallas head_topk.py attempt died on nine K=C_in matmuls):

  * The decoder features [B, h, w, C_in] are pre-transposed on the XLA
    side to [h, C_in, w*B] (one ~34 MB relayout copy).  Rows = C_in
    (sublane-legal at 32), lanes = (w, B) with B minor — so a conv tap's
    w-shift is a shift by exactly B = 128 lanes = WHOLE vregs, and the
    h-shift is a neighboring grid row fetched as two extra CLAMPED
    BlockSpec views of the same operand (the tv_rowtile halo trick).
    Border zeros are produced in-kernel (edge-row wheres + zero
    lane-blocks in the patch concat): the XLA-padded-operand form pays
    ~1.3 ms/call of unfusable transpose/pad/copy passes and measured
    0.55 ms SLOWER in-process (experiments/conv_topk_prep_ab.py).
  * Patches build as a SUBLANE concatenation of the nine shifted
    [C_in, TN] slabs -> [9*C_in, TN] (leading-dim merges are legal;
    there is no lane-splitting reshape anywhere).
  * One dot_general(W_t [S, 9*C_in], patches [9*C_in, TN]) -> [S, TN]
    f32 scores arrive CLASS-MAJOR: the packed-key selection consumes
    them with NO in-register transpose (the score_topk kernel pays one).
    K = 9*C_in = 288 issues as 3 MXU chunks of 128 -> the same 75%
    K-padding ceiling the XLA conv has.
  * Scores round f32 -> bf16 before selection, matching the XLA conv's
    output cast, so the packed key's exact id tie-break applies
    unchanged (score_topk.py docstring).  Interpret mode is bit-equal to
    predict_folded; on hardware, near-ties may resolve differently than
    the XLA-conv path (f32 accumulation order + Mosaic vs XLA cast
    rounding — the same caveat as folded-vs-default).

Contract: C_in a multiple of 8, S a multiple of 128, B*top-k slices
aligned as below; global ids < 2**16 (the packed selector's bound), ids
ascending with -1 for dead slots.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MIN = -(2 ** 31)


def _kernel(x0_ref, x1_ref, x2_ref, wt_ref, ids_ref, idx_ref,
            val_ref=None, *, top_k: int, n_slices: int, tn: int,
            lane_b: int, n_rows: int):
    C_in = x0_ref.shape[1]
    S = wt_ref.shape[0]
    i = pl.program_id(0)
    # Borders are handled IN-KERNEL (round-5 in-process A/B,
    # experiments/conv_topk_prep_ab.py: 5.24 vs 5.79 ms against an
    # XLA-padded operand — the padded form pays ~1.3 ms of unfusable
    # transpose/pad/copy passes per call, more than the edge masking
    # costs).  h halos arrive via CLAMPED index maps; the out-of-image
    # slab is zeroed at the two h edges, and the out-of-image w column of
    # the first/last slice is a zero lane-block in the patch concat.
    zero = jnp.asarray(0, x0_ref.dtype)
    prev = jnp.where(i == 0, zero, x0_ref[0])
    nxt = jnp.where(i == n_rows - 1, zero, x2_ref[0])
    slabs = (prev, x1_ref[0], nxt)  # [C_in, w*B] each
    ids = ids_ref[:].reshape(S, 1)
    add = jnp.int32(0xFFFF) - ids

    for s in range(n_slices):
        parts = []
        for dy in range(3):
            base = slabs[dy]
            for dx in (-1, 0, 1):
                lo = s * tn + dx * lane_b
                if lo < 0:
                    parts.append(jnp.concatenate(
                        [jnp.zeros((C_in, lane_b), base.dtype),
                         base[:, 0:tn - lane_b]], axis=1))
                elif lo + tn > n_slices * tn:
                    parts.append(jnp.concatenate(
                        [base[:, lo:lo + tn - lane_b],
                         jnp.zeros((C_in, lane_b), base.dtype)], axis=1))
                else:
                    parts.append(base[:, lo:lo + tn])
        patches = jnp.concatenate(parts, axis=0)  # [9*C_in, tn]
        scores = jax.lax.dot_general(
            wt_ref[:], patches,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, tn] class-major
        sb = scores.astype(jnp.bfloat16)

        regs = [jnp.full((8, tn), _INT_MIN, jnp.int32)
                for _ in range(top_k)]
        for c in range(S // 8):
            b = jax.lax.bitcast_convert_type(
                sb[c * 8:(c + 1) * 8, :].astype(jnp.float32), jnp.int32)
            idc = ids[c * 8:(c + 1) * 8]
            tc = (b ^ ((b >> 31) & jnp.int32(0x7FFF0000))) \
                + add[c * 8:(c + 1) * 8]
            tc = jnp.where(idc >= 0, tc, jnp.int32(_INT_MIN))
            for i in range(top_k):
                hi = jnp.maximum(regs[i], tc)
                tc = jnp.minimum(regs[i], tc)
                regs[i] = hi
        pool = jnp.concatenate(regs, axis=0)

        def emit(i, pool):
            m = jnp.max(pool, axis=0)
            valid = m != jnp.int32(_INT_MIN)
            gid = jnp.where(valid,
                            jnp.int32(0xFFFF) - (m & jnp.int32(0xFFFF)),
                            jnp.int32(-1))
            idx_ref[i, s * tn:(s + 1) * tn] = gid
            if val_ref is not None:
                bu = (m + gid) & jnp.int32(-65536)
                vb = (bu ^ ((bu >> 31) & jnp.int32(0x7FFFFFFF))) \
                    & jnp.int32(-65536)
                v = jax.lax.bitcast_convert_type(vb, jnp.float32)
                val_ref[i, s * tn:(s + 1) * tn] = jnp.where(
                    valid, v, jnp.float32(-1e30))
            return jnp.where(pool == m[None, :], jnp.int32(_INT_MIN), pool)

        jax.lax.fori_loop(0, top_k, emit, pool, unroll=True)


def fused_conv_topk_applicable(features_shape, S: int,
                               id_bound: Optional[int]) -> bool:
    """Dispatch gate for :func:`fused_conv_score_topk` (predict_folded's
    bf16 TPU path): shapes the kernel's layout contract covers, plus the
    packed-key id bound.  B % 128 keeps the tap shifts whole-vreg and the
    block lane dims 128-divisible; smaller batches keep the two-program
    conv + score_topk path."""
    B, h, w, C_in = features_shape
    return (B % 128 == 0 and C_in % 8 == 0 and S % 128 == 0
            and w % 2 == 0 and id_bound is not None and id_bound < 2 ** 16)


@functools.partial(
    jax.jit, static_argnames=("top_k", "want_values", "interpret",
                              "slice_cols"))
def fused_conv_score_topk(
    features: jax.Array,
    folded_kernel: jax.Array,
    candidate_ids: jax.Array,
    top_k: int = 5,
    want_values: bool = False,
    interpret: bool = False,
    slice_cols: Optional[int] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Args:
      features: [B, h, w, C_in] decoder features (bf16 perf mode).
      folded_kernel: [3, 3, C_in, S] conv weights already contracted with
        the normalized candidate table (predict_folded's ``folded``).
      candidate_ids: [S] i32 ascending global class ids, -1 dead slots;
        every id must be < 2**16 (packed-key tie-break bound).
      slice_cols: w-columns per in-kernel slice (VMEM knob; slice lane
        width = slice_cols * B).

    Returns (idx [K, N] i32, values [K, N] f32 or None) with
    N = h * w * B in (h, w, B) row order — the same internal orientation
    as fused_score_topk; callers reshape/transpose (XLA elides it under
    the usual consumers).
    """
    B, h, w, C_in = features.shape
    S = folded_kernel.shape[-1]
    if C_in % 8 or S % 128:
        raise ValueError(f"need C_in % 8 == 0 and S % 128 == 0, got "
                         f"({C_in}, {S})")
    if slice_cols is None:
        # measured on v5e at the bench scale: sc4 5.50 ms, sc8 5.71,
        # sc16 5.70, sc32 5.64 — mildly insensitive, 4 is best
        slice_cols = next((sc for sc in (4, 8, 16, 2, 1)
                           if w % sc == 0), 1)
    if w % slice_cols:
        raise ValueError(f"slice_cols {slice_cols} must divide w {w}")
    dtype = features.dtype

    # [B, h, w, C] -> [h, C, w*B]: ONE relayout copy on the XLA side;
    # all border zero-padding happens in-kernel (see _kernel).
    x = jnp.transpose(features, (1, 3, 2, 0)).reshape(h, C_in, w * B)

    # weight rows ordered (dy, dx, c) to match the patch concat order
    wt = jnp.transpose(folded_kernel, (3, 0, 1, 2)).reshape(S, 9 * C_in)
    wt = wt.astype(dtype)

    tn = slice_cols * B
    n_slices = w // slice_cols
    N = h * w * B

    out_shape = [jax.ShapeDtypeStruct((top_k, N), jnp.int32)]
    out_specs = [pl.BlockSpec((top_k, w * B), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if want_values:
        out_shape.append(jax.ShapeDtypeStruct((top_k, N), jnp.float32))
        out_specs.append(pl.BlockSpec((top_k, w * B), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel, top_k=top_k, n_slices=n_slices, tn=tn, lane_b=B,
        n_rows=h)
    row_block = (1, C_in, w * B)
    out = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec(row_block, lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block,
                         lambda i: (jnp.minimum(i + 1, h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 9 * C_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, x, x, wt, candidate_ids.astype(jnp.int32))
    idx = out[0]
    val = out[1] if want_values else None
    return idx, val
