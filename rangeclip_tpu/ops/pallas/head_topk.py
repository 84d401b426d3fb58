"""Fully-fused segmentation head: output-conv + L2-normalize + pixel x text
scoring + masked top-k in one Pallas TPU kernel.

The predict hot path after the decoder blocks is (reference decoder.py:75-82
+ model.py:144,161-169): 3x3 SAME conv from the last block's C_in channels
to the D=512 embedding space, per-pixel L2 normalization, a [N, D] x [D, C]
cosine-similarity matmul, and top-k over the masked candidate classes.

STATUS: benchmarked NEGATIVE result, kept as a tested opt-in (like
ops/pallas/tv_loss.py).  Measured on TPU v5e at the canonical bench config
(batch 32, 256^2, bf16, C=512): fused 1900 maps/s vs 2016 maps/s for the
XLA-conv + scoring-kernel path.  The HBM traffic saved by never
materializing the [B, h, w, 512] field is outweighed by the conv's MXU
inefficiency in here: nine K=32 matmuls run the MXU at ~25% K-occupancy,
while XLA's conv lowers to K=288 im2col.  The default predict path
therefore keeps the XLA conv; this kernel remains correct (exact-label
parity test) for configs where C_in is MXU-sized.

Under XLA + the scoring-only kernel the head costs three full HBM
round-trips of the [B, h, w, 512] field (conv write, relayout copy for the
Pallas operand, kernel read — ~4.5 ms of a ~14 ms pipeline at the
canonical 256^2/bf16 config, measured).  This kernel never materializes
the field:
each grid step takes one row-tile of an image's *pre-head* features
(C_in=32 — 16x smaller than the field), computes the conv as shifted-slice
matmuls in VMEM, and runs normalize/score/top-k on the tile before it ever
leaves the chip.

The conv is bias-free with no activation (net_utils.py:51-142 epilogue
disabled for the output head, decoder.py:75-82), so the whole head is MXU
matmuls per tile: nine shifted-slice [rh*w, C_in] x [C_in, D] partial
products for the conv (Mosaic rejects the im2col lane-concat — slice
offsets differ — and pltpu.roll only supports 32-bit element types on
v5e), then [D-major] scoring.  Matmuls run in the feature dtype (bf16 at
MXU rate in the perf mode, f32 in the parity mode) with f32 accumulation;
normalization statistics are always f32.

Grid design: one grid step per (image, row-tile) — NOT a python loop over
tiles inside the kernel, which unrolls h/rh copies of the body and blows
up Mosaic compile time.  The input arrives zero-padded by +1 on each
spatial edge (one cheap XLA pad of the small pre-head field), so a tile's
conv halo is a plain dynamic row-slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _choose_rows(h: int, w: int) -> int:
    """Output rows per grid tile: divide h, keep the tile MXU-sized but
    VMEM-friendly (rh*w in [128, 1024] when possible)."""
    best = 1
    for rh in range(1, h + 1):
        if h % rh:
            continue
        if rh * w <= 1024:
            best = rh
        else:
            break
    return best


def _head_kernel(x_ref, w_ref, text_ref, mask_ref, idx_ref, val_ref,
                 *, top_k: int, rh: int, w: int):
    t = pl.program_id(1)
    cin = x_ref.shape[3]
    # [rh+2, w+2, cin] halo rows of the zero-padded image (pad done in XLA)
    rows = x_ref[0, pl.ds(t * rh, rh + 2)]

    wmat = w_ref[:]          # [9*cin, D]
    text = text_ref[:]       # [C, D]
    C = text.shape[0]
    mask_col = mask_ref[:].reshape(C, 1) != 0

    # 3x3 conv as nine shifted-slice [rh*w, cin] x [cin, D] matmuls with a
    # shared f32 accumulator.
    f = jnp.zeros((rh * w, wmat.shape[1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            piece = rows[dy:dy + rh, dx:dx + w]
            f = f + jax.lax.dot_general(
                piece.reshape(rh * w, cin),
                wmat[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rh*w, D] f32

    sq = jnp.sum(f * f, axis=1, keepdims=True)
    emb = (f * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(rows.dtype)
    # Scores land class-major [C, tn]: the top-k reductions then run over
    # sublanes and produce lane-oriented [tn] rows that store straight into
    # the [k, N] outputs (a pixel-major [N, k] output block pads k=5 lanes
    # to 128 and OOMs VMEM at 128^2 resolution).
    scores = jax.lax.dot_general(
        text, emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, rh*w]
    scores = jnp.where(mask_col, scores, NEG_INF)

    tn = rh * w
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (C, tn), dimension=0)
    for i in range(top_k):
        m = jnp.max(scores, axis=0)
        is_max = scores >= m[None, :]
        idx = jnp.min(jnp.where(is_max, row_ids, C), axis=0)
        idx_ref[i, :] = idx
        val_ref[i, :] = m
        scores = jnp.where(row_ids == idx[None, :], NEG_INF, scores)


@functools.partial(jax.jit, static_argnames=("top_k", "interpret"))
def fused_head_score_topk(
    features: jax.Array,
    head_kernel: jax.Array,
    text_normalized: jax.Array,
    candidate_mask: jax.Array,
    top_k: int = 5,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Args:
      features: [B, h, w, C_in] pre-head decoder features.
      head_kernel: [3, 3, C_in, D] HWIO output-conv kernel (bias-free).
      text_normalized: [C, D] L2-normalized text table.
      candidate_mask: [C] bool/int candidate-set membership.
      top_k: labels per pixel.

    Returns: (indices [B*h*w, k] int32, values [B*h*w, k] f32), row-major.
    """
    B, h, w, cin = features.shape
    D = head_kernel.shape[-1]
    C = text_normalized.shape[0]
    rh = _choose_rows(h, w)
    T = h // rh

    padded = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wmat = head_kernel.reshape(9 * cin, D).astype(features.dtype)
    kernel = functools.partial(_head_kernel, top_k=top_k, rh=rh, w=w)
    idx, val = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            # same image block for every row-tile t; Pallas skips the
            # recopy when the block index is unchanged across steps
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, D), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((top_k, rh * w), lambda b, t: (0, b * T + t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((top_k, rh * w), lambda b, t: (0, b * T + t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((top_k, B * h * w), jnp.int32),
            jax.ShapeDtypeStruct((top_k, B * h * w), jnp.float32),
        ],
        interpret=interpret,
    )(
        padded,
        wmat,
        text_normalized.astype(features.dtype),
        candidate_mask.astype(jnp.int32),
    )
    return idx.T, val.T
