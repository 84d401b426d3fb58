"""Masked top-k selection over a precomputed pixel x candidate score field.

Companion to ops/pallas/pixel_text_topk.py for the FOLDED segmentation
head (models/depth_unet.py predict_folded): there the 3x3 output conv's
weights are contracted with the candidate text table offline, so an XLA
conv emits the [B, h, w, S] candidate-score field directly — at full
K=9*C_in im2col MXU occupancy — and all that remains on the device is
this kernel: mask invalid slots, take top-k over the S lanes, and emit
GLOBAL class ids (reference model.py:167-173's index map, done in-kernel
for the same reason as pixel_text_topk: an XLA [N, k] gather remap of the
output costs ~3x the whole selection).

Orientation: scores arrive pixel-major with S on lanes (the conv's
natural minor dim), but selecting in that orientation is the measured
WRONG choice — each tile is instead transposed in-register to
class-major [S, TN] and selected with sublane reductions, emitting
lane-oriented [TN] rows straight into the [k, N] output (k rows of N
pixels — the [N, k] orientation would lane-pad k->128, the round-2
lesson).  Selection casts stored scores to f32 (bf16->f32 is injective
and monotone, so the order — including ties — is exactly that of the
stored bf16 values; Mosaic also rejects sub-f32 comparisons outright:
"Target does not support this comparison").  Ids are i32; ties break to
the smallest id exactly like lax.top_k over ascending-id slots.

Measured dead ends at the bench scale (N=2.1M, S=384 — don't re-learn):

  * Lane-minor selection (reduce over the S lanes per pass, as the data
    arrives): 65 ms vs 9.9 ms for transpose-then-sublane — five passes
    of cross-lane max/min cost far more than one in-register transpose.
  * ``jnp.where(is_max, ids, SENT)`` with SUBLANE-replicated [1, S] ids
    fails to compile on-chip (interpret mode cannot catch it): "Invalid
    relayout: non-singleton logical dimension is replicated in
    destination but not in source" for the i1 mask.  Lane-replicated
    [S, 1] ids (the pixel_text_topk pattern, used here post-transpose)
    lay out fine; the lane-minor variant needed an arithmetic min-key
    argmax (penalize non-max slots by a large id offset) to compile.
  * A 4096-row tile OOMs scoped VMEM (19 MB > 16 MB) once the f32
    working set and the unrolled knockout loop are accounted —
    _TILE_ELEMS budgets rows*S instead.

bf16 PACKED-KEY fast path (the bench/serve default — conv scores are
bf16 in the perf mode): a bf16 value widened to f32 has its low 16
mantissa bits ZERO, so the f32 bit pattern mapped through the standard
sign-magnitude -> two's-complement trick (``b ^ ((b >> 31) &
0x7FFFFFFF)``) is a monotone int32 sort key with 16 free low bits —
room for the slot's global id as an EXACT tie-break (``| 0xFFFF`` then
``- id``: ties go to the smallest id, the lax.top_k slot order).  This
is NOT the recorded ``pixel_text_topk`` mantissa-packing dead end: there
the scores were f32 MXU accumulators with live low mantissa bits, so
packing perturbed the order; here the low bits are structurally zero.
One int32 array then carries value+id together, which converts the
selection from five knockout passes over [S, TN] (max + compare +
masked-min + knockout-where ~ 4 traversals each, ~20 S-traversals
total) into one sorted-insert sweep: the key array is walked once in
[8, TN] sublane chunks, each chunk inserted into five running [8, TN]
top-registers with a 2-op max/min cascade (10 full-vreg ops per 8
classes), and the final 8*k-row pool is knocked out in k cheap passes.
~10 S-traversals equivalent (A/B numbers: experiments/select_ab.py),
with ids and values decoded exactly from the winning keys.  Round 5: the
key arithmetic moved inside the chunk loop (no [S, TN] f32/i32
intermediates live across it) after the stage-ablation probe
(experiments/select_ablate_probe.py) showed those intermediates starving
the input double-buffer — 3.9 -> 2.45 ms at the bench scale, ~80% of the
field's HBM-read roofline, checksum-identical.

Semantic differences from the knockout path, all outside the range of
real conv scores: packed keys rank +0.0 above -0.0 instead of breaking
the tie by id; valid scores below the NEG_INF mask value (-1e30) still
win under packed where knockout treats them as masked; a NaN score
(exponent-all-ones key) would rank top under packed but never wins
knockout's >= comparisons.
Contract: global ids must fit 16 bits — the wrapper dispatches packed
only when a STATIC id bound < 2**16 is known (default arange ids, or
the caller's ``max_id``); otherwise, and for f32 scores (the fp32
parity mode), the knockout loop runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _select_kernel(scores_ref, ids_ref, idx_ref, val_ref=None, *, top_k: int):
    scores = scores_ref[:]
    scores = scores.reshape(-1, scores.shape[-1])  # 4-D row blocks -> [TN, S]
    S = scores.shape[-1]
    # Transpose each tile to CLASS-MAJOR [S, TN] and select with sublane
    # reductions + lane-replicated [S, 1] ids — the pixel_text_topk
    # formulation.  Measured at the bench scale (N=2.1M, S=384, TN=2048):
    # 9.9 ms, vs 65 ms selecting in the arriving lane-minor orientation
    # (cross-lane max/min over S lanes per pass; the in-register transpose
    # is 6.6x cheaper than lane-reducing five times).
    ids = ids_ref[:].reshape(S, 1)
    neg = jnp.float32(NEG_INF)
    scores = scores.astype(jnp.float32).T
    scores = jnp.where(ids >= 0, scores, neg)
    SENT = jnp.int32(2**31 - 1)

    def body(i, scores):
        m = jnp.max(scores, axis=0)  # [TN] sublane reduction
        # argmax via masked min-id (ties -> smallest id, = lax.top_k over
        # ascending-id slots); lane-replicated ids keep Mosaic's layout
        # inference happy — see module docstring
        is_max = scores >= m[None, :]
        idx = jnp.min(jnp.where(is_max, ids, SENT), axis=0)
        idx_ref[i, :] = idx
        if val_ref is not None:
            val_ref[i, :] = m
        # knock the winner out for the next pass
        return jnp.where(ids == idx[None, :], neg, scores)

    jax.lax.fori_loop(0, top_k, body, scores, unroll=True)


_INT_MIN = -(2**31)


def _select_kernel_packed(scores_ref, ids_ref, idx_ref, val_ref=None, *,
                          top_k: int):
    """bf16 packed-key selection — see the module docstring.  Exactly the
    knockout path's semantics (smallest-id ties, -1/-NEG_INF overflow
    fills) for bf16 scores with global ids < 2**16.

    The key arithmetic runs PER 8-ROW CHUNK inside the insert loop (round
    5): computing the full [S, TN] key up front materializes an f32 widen
    plus an i32 key array (~12.6 MB at the shipped tile), which starves
    the input double-buffer — the round-5 stage-ablation probe
    (experiments/select_ablate_probe.py) measured the whole-array form at
    3.9 ms vs 2.45 ms chunk-wise against a 1.97 ms HBM-read floor (the
    transpose and key arithmetic themselves are FREE, fully hidden under
    the stream, once nothing large stays live).  The chunk form also uses
    one fused add for the |0xFFFF / -id steps: for bf16-widened scores
    (low 16 mantissa bits structurally zero) flipping only the TOP 15
    magnitude bits (`& 0x7FFF0000`) gives the same order, and then
    `key = m' + (0xFFFF - id)` equals the two-step form for positive AND
    negative scores — checksum-identical on the bench field."""
    scores = scores_ref[:]
    scores = scores.reshape(-1, scores.shape[-1])  # 4-D row blocks -> [TN, S]
    S = scores.shape[-1]
    tn = scores.shape[0]
    ids = ids_ref[:].reshape(S, 1)
    t = scores.T  # bf16 in-register transpose (half the f32 vreg traffic)
    add = jnp.int32(0xFFFF) - ids
    # Trace-time Python loop with STATIC slices: a traced chunk index
    # would be a dynamic_slice of a VALUE, which has no Mosaic TC
    # lowering rule ("Unimplemented primitive ... dynamic_slice", hit on
    # hardware — interpret mode cannot catch it; the TPU-lowering
    # regression test in tests/test_tpu_lowering.py now does).
    regs = [jnp.full((8, tn), _INT_MIN, jnp.int32) for _ in range(top_k)]
    for c in range(S // 8):
        b = jax.lax.bitcast_convert_type(
            t[c * 8:(c + 1) * 8, :].astype(jnp.float32), jnp.int32)
        idc = ids[c * 8:(c + 1) * 8]
        tc = (b ^ ((b >> 31) & jnp.int32(0x7FFF0000))) \
            + add[c * 8:(c + 1) * 8]
        tc = jnp.where(idc >= 0, tc, jnp.int32(_INT_MIN))
        for i in range(top_k):
            hi = jnp.maximum(regs[i], tc)
            tc = jnp.minimum(regs[i], tc)
            regs[i] = hi
    # Each of the 8 sublane streams now holds its own sorted top-k, and
    # every global top-k element is top-k within its stream: knock out the
    # 8*k-row pool k times for the global winners.
    pool = jnp.concatenate(regs, axis=0)  # [8*top_k, TN]

    def emit(i, pool):
        m = jnp.max(pool, axis=0)  # [TN] i32
        valid = m != jnp.int32(_INT_MIN)
        gid = jnp.where(valid, jnp.int32(0xFFFF) - (m & jnp.int32(0xFFFF)),
                        jnp.int32(-1))
        idx_ref[i, :] = gid
        if val_ref is not None:
            # undo `- id`, clear the low-bit base, undo the sign trick:
            # exactly the f32 bits of the stored bf16 score
            bu = (m + gid) & jnp.int32(-65536)
            vb = (bu ^ ((bu >> 31) & jnp.int32(0x7FFFFFFF))) \
                & jnp.int32(-65536)
            v = jax.lax.bitcast_convert_type(vb, jnp.float32)
            val_ref[i, :] = jnp.where(valid, v, jnp.float32(NEG_INF))
        return jnp.where(pool == m[None, :], jnp.int32(_INT_MIN), pool)

    jax.lax.fori_loop(0, top_k, emit, pool, unroll=True)


# Per-tile element budget rows*S.  Knockout: the working set is ~4.6
# B/elem (f32 scores + live i32 keys under the unrolled loop + double-
# buffered bf16 input); 768Ki elems measured ~9.5 MB scoped VMEM of the
# 16 MB limit (4096x384 OOM'd at 19 MB on v5e).  Packed: one i32 key
# array replaces the f32 scores and the knockout's live copies, so DOUBLE
# the tile fits — and wins (experiments/select_ab.py on-chip: knockout
# 7.66 ms, packed@768Ki 5.84, packed@1536Ki 5.67 at the bench scale).
_TILE_ELEMS = 768 * 1024
_TILE_ELEMS_PACKED = 1536 * 1024


def _tile_axis(axis: int, inner: int, limit: int = _TILE_ELEMS):
    """Largest divisor t of ``axis`` with t*inner <= limit (per-grid-step
    overhead is real — round-2 lesson: pick the LARGEST valid tile)."""
    from rangeclip_tpu.ops.pallas.tiling import largest_divisor_tile

    return largest_divisor_tile(axis, inner, limit)


@functools.partial(
    jax.jit, static_argnames=("top_k", "want_values", "interpret",
                              "selector", "max_id")
)
def fused_score_topk(
    scores: jax.Array,
    candidate_ids: Optional[jax.Array] = None,
    top_k: int = 5,
    want_values: bool = False,
    interpret: bool = False,
    selector: str = "auto",
    max_id: Optional[int] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Args:
      scores: [N, S] or [h, w, B, S] pixel x candidate-slot scores (any
        float dtype; selection compares stored values).  The 4-D form is
        the free logical transpose of a conv's [B, h, w, S] output (layout
        {3,0,2,1}) — same trick as pixel_text_topk.
      candidate_ids: [S] i32 ASCENDING global class id per slot, -1 for
        invalid (masked) slots; default arange(S) (all valid).
      top_k: labels per pixel.
      want_values: also emit the winning score values (f32).

    Returns: (indices [N, k] i32 of GLOBAL class ids, values [N, k] f32 or
      None).  Like pixel_text_topk, outputs are computed [k, N] internally;
      the public [N, k] transpose is elided by XLA under reductions.
    """
    S = scores.shape[-1]
    if S % 128:
        raise ValueError(f"slot count {S} must be a lane multiple (128)")
    lead = scores.shape[:-1]
    N = 1
    for d in lead:
        N *= d

    default_ids = candidate_ids is None
    if default_ids:
        candidate_ids = jnp.arange(S, dtype=jnp.int32)

    # Selector dispatch happens BEFORE tiling: the packed path's lighter
    # working set affords double the tile budget.  bf16 scores take the
    # packed-key sorted-insert path (module docstring); f32 (the parity
    # mode) keeps the knockout loop.  The packed id tie-break needs a
    # STATIC bound: ids < 2**16.  With default ids that bound is S - 1;
    # with caller-supplied candidate_ids the caller must pass ``max_id``
    # (its global class count - 1) or auto-dispatch conservatively keeps
    # the knockout loop.  ``selector`` overrides the dtype dispatch for
    # A/B scripts and tests (packed still requires bf16 input for its
    # zero-low-bits guarantee).
    id_bound = (S - 1) if default_ids else max_id
    packed_ok = (scores.dtype == jnp.bfloat16 and id_bound is not None
                 and id_bound < 2**16)
    if selector == "auto":
        use_packed = packed_ok
    elif selector in ("packed", "knockout"):
        use_packed = selector == "packed"
        if use_packed and not packed_ok:
            raise ValueError(
                "packed selector requires bf16 scores and a static id "
                f"bound < 2**16 (got dtype {scores.dtype}, bound "
                f"{id_bound})")
    else:
        raise ValueError(f"unknown selector {selector!r}")
    limit = _TILE_ELEMS_PACKED if use_packed else _TILE_ELEMS

    if scores.ndim == 4:
        h, w, B, _ = scores.shape
        wt = _tile_axis(w, B * S, limit)
        if wt * B < 8:
            raise ValueError(f"row tile {wt}x{B} below the sublane minimum")
        grid = (h, w // wt)
        block = (1, wt, B, S)
        in_map = lambda i, j: (i, j, 0, 0)
        out_map = lambda i, j: (0, i * (w // wt) + j)
        tn = wt * B
    else:
        scores = scores.reshape(N, S)
        tn = _tile_axis(N, S, limit)
        grid = (N // tn,)
        block = (tn, S)
        in_map = lambda i: (i, 0)
        out_map = lambda i: (0, i)

    out_shape = [jax.ShapeDtypeStruct((top_k, N), jnp.int32)]
    out_specs = [
        pl.BlockSpec((top_k, tn), out_map, memory_space=pltpu.VMEM)
    ]
    if want_values:
        out_shape.append(jax.ShapeDtypeStruct((top_k, N), jnp.float32))
        out_specs.append(
            pl.BlockSpec((top_k, tn), out_map, memory_space=pltpu.VMEM)
        )

    nargs = len(grid)
    ids_map = (lambda i: (0,)) if nargs == 1 else (lambda i, j: (0,))
    body = _select_kernel_packed if use_packed else _select_kernel
    kernel = functools.partial(body, top_k=top_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), ids_map, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(scores, candidate_ids.astype(jnp.int32))

    idx = out[0].T
    val = out[1].T if want_values else None
    return idx, val
