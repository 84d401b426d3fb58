"""Fused pixel x text scoring + masked top-k (Pallas TPU kernel).

The reference's predict epilogue (model.py:144,161-169) is: L2-normalize
pixel embeddings, L2-normalize the reduced text table, a [B*H*W, D] x
[D, C] matmul, then top-k over C.  Under XLA this lowers to a matmul
followed by a generic sort-based top-k with the [N, C] logits round-tripping
through HBM.

This kernel keeps a [TILE_N, C] score tile in VMEM end-to-end: normalize
the pixel tile (VPU), hit the MXU for the scores, apply the candidate mask,
and extract the top-k by k iterative max/argmax passes (k is 5; k passes
over C lanes on the VPU beat a full sort and never materialize the logits
in HBM).  Output is [N, k] indices + values.

Input can be the [B, H, W, D] field directly — XLA inserts a physical
relayout (a full HBM round-trip of the field) for the flat [N, D] view, so
4-D row blocks are the fast path (same trick as pixel_text_ce.py).  The
matmul runs in the field's own dtype (bf16 fields score on the MXU at bf16
rate with f32 accumulation; fp32 fields keep full precision for the parity
mode); normalization statistics are always f32.

The text table must be pre-L2-normalized (one [C, D] pass, amortized across
every batch, exactly as the reference normalizes the gathered table once
per predict call).

Measured variants that did NOT make the cut (TPU v5e, canonical bench
config: batch 128, 256^2, C=512, bf16 — base 12.2 ms standalone):
  * 4096-row tiles: 8 MB f32 score tile blows the ~16 MB VMEM budget
    (Mosaic scoped-vmem OOM at 18.9 MB with double buffering);
  * splitting each tile into 2-4 chunks so the next chunk's MXU matmul
    could overlap the previous chunk's VPU top-k passes: no change
    (12.4 ms) — Mosaic serializes the kernel body's dataflow;
  * packing a 10-bit inverted class index into the low mantissa bits of
    the sortable-int scores (one max-reduction per top-k pass instead of
    max + masked min-index): 9.6 ms (-21%) but INEXACT — candidates whose
    f32 scores differ only below 2^-13 relative get reordered by index,
    breaking the kernel's exact-equality contract with lax.top_k;
  * int8-quantized scoring (round(unit_emb*127) int8 x int8 text on the
    2x-rate int8 MXU, int32 selection): 12.6 ms — the in-kernel quantize
    pass costs what the faster matmul saves, AND top-1 agreement with
    exact scoring was only ~88% on random unit vectors.  Slower and
    lossy; rejected outright.
The selection loop below is the fastest *exact* formulation found.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _topk_rows_per_block(H: int, W: int, C: int = 512):
    """Largest row tile: rh divides H, rh*W is a 128-lane multiple, and the
    [C, rh*W] f32 score tile stays VMEM-friendly.  Unlike the CE kernel
    (whose small tiles balance its two-pass fwd/bwd), top-k is one pass and
    per-grid-step overhead dominates at small tiles: 128-row tiles measured
    4.5 ms vs 2048-row tiles ~2x faster at the canonical config.

    The cap scales inversely with the class count so large label tables
    (NYUv2 transfer, thousands of classes) shrink the tile instead of
    blowing the ~16 MB VMEM budget: 2048 rows at C=512 is a 4 MB score
    tile; the same budget gives 256 rows at C=4096."""
    max_rows = max((2048 * 512) // max(C, 512) // 128 * 128, 128)
    best = None
    for rh in range(1, H + 1):
        if H % rh or (rh * W) % 128 or rh * W > max_rows:
            continue
        best = rh
    return best


def _topk_kernel(emb_ref, text_ref, mask_ref, ids_ref, idx_ref, val_ref=None,
                 *, top_k: int):
    emb = emb_ref[:]
    emb = emb.reshape(-1, emb.shape[-1])  # 4-D row blocks -> [TN, D]
    # L2 normalize pixels (model.py:144); stats in f32, product back in the
    # field dtype so a bf16 field scores at MXU bf16 rate.
    sq = jnp.sum(emb.astype(jnp.float32) * emb.astype(jnp.float32), axis=1,
                 keepdims=True)
    rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
    emb = (emb.astype(jnp.float32) * rs).astype(emb_ref.dtype)

    # Scores land class-major [C, TN] on the MXU (f32 accumulation): the
    # top-k reductions then run over sublanes and yield lane-oriented [TN]
    # rows that store straight into the [k, N] outputs.  (A pixel-major
    # [N, k] output is lane-padded k->128 on TPU — ~25x its logical bytes.)
    scores = jax.lax.dot_general(
        text_ref[:],
        emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # candidate masking (reduced-set predict, model.py:147-161)
    scores = jnp.where(mask_ref[:].reshape(-1, 1) != 0, scores, NEG_INF)

    C, TN = scores.shape
    # Per-row output ids: arange(C) for full-table scoring, or the global
    # candidate class ids for the gathered reduced-table form — the kernel
    # then emits GLOBAL ids directly, replacing what would otherwise be a
    # [N, k]-sized XLA gather remap downstream (measured 86 ms at the
    # canonical predict config — 3x the whole kernel).  Ids must be
    # ascending over rows (build_candidate_indices emits them so): then
    # min-id tie-breaking == min-row tie-breaking == lax.top_k.
    row_ids = ids_ref[:].reshape(-1, 1)
    SENT = jnp.int32(2**31 - 1)

    def body(i, scores):
        m = jnp.max(scores, axis=0)  # [TN]
        # argmax via masked min-id (ties -> smallest id, = lax.top_k)
        is_max = scores >= m[None, :]
        idx = jnp.min(jnp.where(is_max, row_ids, SENT), axis=0)
        # exhausted candidate set (fewer candidates than top_k): every
        # remaining score is NEG_INF — emit the -1 no-candidate sentinel
        # (the convention shared with score_topk.py / predict_folded)
        # instead of a duplicate min-id winner
        idx = jnp.where(m > jnp.float32(-1e29), idx, -1)
        idx_ref[i, :] = idx
        if val_ref is not None:
            val_ref[i, :] = m
        # knock the winner out for the next pass (-1 padding rows share an
        # id, but they are all NEG_INF already, so a joint knockout is moot)
        return jnp.where(row_ids == idx[None, :], NEG_INF, scores)

    jax.lax.fori_loop(0, top_k, body, scores, unroll=True)


@functools.partial(
    jax.jit, static_argnames=("top_k", "tile_n", "interpret", "want_values")
)
def fused_pixel_text_topk(
    pixel_embeddings: jax.Array,
    text_normalized: jax.Array,
    candidate_mask: jax.Array,
    top_k: int = 5,
    tile_n: int = 512,
    interpret: bool = False,
    want_values: bool = True,
    candidate_ids: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Args:
      pixel_embeddings: [N, D] or [B, H, W, D] (un-normalized; normalization
        is fused).  The 4-D form avoids the flat-view relayout.
      text_normalized: [C, D] L2-normalized text table.
      candidate_mask: [C] bool/int — True for classes in the candidate set.
      candidate_ids: optional [C] int32 ASCENDING output id per table row
        (for the gathered reduced-candidate form, where row i of the table
        is global class ``candidate_ids[i]``); default arange(C).  The
        kernel emits these ids directly — an XLA gather remap of the [N, k]
        output costs ~86 ms at the canonical predict config, 3x the whole
        kernel.
      top_k: number of labels per pixel.
      tile_n: pixels per grid step for the flat form (multiple of 8).
      want_values: emit the score values too.  ``False`` drops the second
        output entirely — an [N, k] minor-dim-k array is lane-padded k->128
        on TPU (~25x its logical bytes; 268 MB at the canonical predict
        config), so skipping an unused values array saves a large HBM write.

    Returns: (indices [N, k] int32, values [N, k] float32 — None when
    ``want_values=False``), N = B*H*W row-major for the 4-D form.
    """
    C = text_normalized.shape[0]
    if pixel_embeddings.ndim == 4 and (
        _topk_rows_per_block(*pixel_embeddings.shape[1:3], C=C) is None
    ):
        pixel_embeddings = pixel_embeddings.reshape(-1, pixel_embeddings.shape[-1])

    if pixel_embeddings.ndim == 4:
        B, H, W, D = pixel_embeddings.shape
        rh = _topk_rows_per_block(H, W, C=C)
        hb = H // rh
        grid = (B * hb,)
        emb_spec = pl.BlockSpec(
            (1, rh, W, D), lambda i, hb=hb: (i // hb, i % hb, 0, 0),
            memory_space=pltpu.VMEM,
        )
        row_tile = rh * W
        n_padded = N = B * H * W
    else:
        N, D = pixel_embeddings.shape
        # C-aware flat tile: keep the [C, tile] f32 score block ~4 MB
        tile_n = min(tile_n, max((2048 * 512) // max(C, 512) // 128 * 128,
                                 128))
        pad = (-N) % tile_n
        if pad:
            pixel_embeddings = jnp.pad(pixel_embeddings, ((0, pad), (0, 0)))
        n_padded = pixel_embeddings.shape[0]
        grid = (n_padded // tile_n,)
        emb_spec = pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        row_tile = tile_n

    kernel = functools.partial(_topk_kernel, top_k=top_k)
    out_spec = pl.BlockSpec((top_k, row_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec, out_spec] if want_values else [out_spec]
    out_shape = [jax.ShapeDtypeStruct((top_k, n_padded), jnp.int32)]
    if want_values:
        out_shape.append(jax.ShapeDtypeStruct((top_k, n_padded), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            emb_spec,
            pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        pixel_embeddings,
        text_normalized.astype(pixel_embeddings.dtype),
        candidate_mask.astype(jnp.int32),
        (jnp.arange(C, dtype=jnp.int32) if candidate_ids is None
         else candidate_ids.astype(jnp.int32)),
    )

    # Public orientation stays [N, k]; under a downstream reduction (e.g.
    # the bench checksum) XLA elides the transpose instead of materializing
    # the lane-padded [N, k] array.
    if want_values:
        return outs[0].T[:N], outs[1].T[:N]
    return outs[0].T[:N], None
