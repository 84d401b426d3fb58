"""Fused pixel-text InfoNCE cross-entropy (Pallas TPU kernels + custom VJP).

The training hot loop's dominant loss term (reference model.py:271-291):
CE over ``normalize(samples) @ normalize(text).T / temperature`` with the
contrast set masked to -inf.  Under XLA the [N, C] logits (N ~ 0.7*B*H*W)
materialize in HBM three times (logits, logsumexp pass, gather pass) —
~6.5 ms forward at the canonical 256^2 config.  These kernels keep each
logit tile in VMEM for both passes, CLASS-MAJOR ([C, TILE_N] — classes on
sublanes, sample rows on lanes; see _tile_logits for the measured 2.6x /
2.2x layout rationale):

  forward: normalize (VPU) -> logits (MXU) -> mask -> logsumexp + one-hot
           pick (VPU) -> per-sample weighted CE row (summed by the caller).
  backward: recompute the tile's softmax, then
           d_samples = J_normalize^T [ (p - y) @ text * coeff / temp ],
           per-sample d log-temperature row = coeff * (picked - E_p[logits])
           (temperature enters as logits = sim / temp with temp = e^logtau,
           so dlogits/dlogtau = -logits; the caller chains to d temp).

Gradients flow to ``samples`` and the scalar ``temperature`` only — the
text table is frozen (reference train_util.py:129-131), so its cotangent is
zero by construction.

PACKED CONTRAST (``class_ids``): the contrast set is typically far smaller
than the label table (present labels + k=50 distractors vs C classes), so
scoring all C columns wastes MXU and VPU work in proportion.  The caller
may gather the member rows into a fixed-capacity [K, D] table and pass the
members' ASCENDING global class ids as ``class_ids`` [K] (sentinel >= C in
padded slots, mask 0): the kernels then compare label targets against the
id row instead of the column iota, so labels stay GLOBAL — no [S, N]
label remap, which a small-table XLA gather would make pathological on
TPU (measured 86 ms for a 10.5M-index remap; see score_topk's identical
in-kernel remap for predict).  Softmax membership is unchanged (padded
rows get -inf logits), so values match the full-C form up to f32
reduction order over K vs C sublanes.  losses/infonce.py builds the
packing and falls back to the full-C kernel via lax.cond when the live
contrast set overflows K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tile_logits(samples_ref, text_ref, mask_ref, inv_temp):
    """Scores computed CLASS-MAJOR: [C, TN], classes on sublanes, sample
    rows on lanes.  The row-major [TN, C] form forced a lane->sublane
    relayout of the [TN] label vector per slot per tile (the same Mosaic
    gotcha score_topk.py documents for selection: lane-minor = 65 ms vs
    9.9 ms) and a final sublane->lane relayout of every per-row output —
    measured 2.6x fwd / 2.2x bwd slower than this layout at the canonical
    packed config (experiments/ce_ablate_probe.py, identical checksums).
    Class-major makes the label compare a free lane-aligned broadcast,
    every softmax/pick reduction a sublane reduction, and the [1, TN]
    output rows land in their natural layout."""
    s = samples_ref[:]
    # 4-D row blocks [1, 1, W, D] arrive from the no-relayout path; the
    # squeeze to [W, D] only drops leading 1s (lane/sublane dims untouched).
    s = s.reshape(-1, s.shape[-1]).astype(jnp.float32)  # [TN, D]
    sq = jnp.sum(s * s, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
    emb = s * rs
    # MXU operand dtype follows the text table: in the bf16 perf mode the
    # caller ships the table as bf16 and the scoring matmul runs native
    # bf16 x bf16 -> f32 (an f32 matmul costs multiple MXU passes); in the
    # f32 parity mode the astype is a no-op and numerics are unchanged.
    sim = jax.lax.dot_general(
        text_ref[:], emb.astype(text_ref.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, TN]
    logits = jnp.where(mask_ref[:][:, None] != 0, sim * inv_temp, NEG_INF)
    return emb, rs, logits


def _row_ids(ids_ref, C):
    """Per-SUBLANE target ids [C, 1]: the class-axis iota for full-table
    scoring, or the global-id column for the packed-contrast form (labels
    stay global; padded slots carry a sentinel >= C no label can match).
    Lane-replicated [C, 1] ids are the Mosaic-friendly orientation
    (sublane-replicated [1, C] broke layout inference in where();
    score_topk.py lesson)."""
    if ids_ref is None:
        return jax.lax.broadcasted_iota(jnp.int32, (C, 1), dimension=0)
    return ids_ref[:]


def _fwd_kernel(inv_temp_ref, samples_ref, labels_ref, valid_ref, text_ref,
                mask_ref, *refs):
    ids_ref, ce_ref = refs if len(refs) == 2 else (None, refs[0])
    _, _, logits = _tile_logits(samples_ref, text_ref, mask_ref,
                                inv_temp_ref[0])
    m = jnp.max(logits, axis=0, keepdims=True)  # [1, TN]
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True))

    C, TN = logits.shape
    ids_col = _row_ids(ids_ref, C)  # [C, 1]
    # Label SLOTS: each sample row carries S (label, weight) pairs and its
    # CE contribution is sum_s w_s (lse - picked_s) — the native-resolution
    # training identity, where one decoder pixel serves the labels of its
    # upsample children.  S == 1 is the classic one-label-per-pixel case.
    S = labels_ref.shape[0]
    wsum = jnp.zeros((1, TN), jnp.float32)
    wpick = jnp.zeros((1, TN), jnp.float32)
    for s in range(S):
        onehot = ids_col == labels_ref[s, :][None, :]  # [C, TN]
        picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=0,
                         keepdims=True)
        w = valid_ref[s, :][None, :]
        wsum = wsum + w
        wpick = wpick + w * picked

    ce_ref[:] = wsum * lse - wpick


def _bwd_kernel(inv_temp_ref, coeff_ref, samples_ref, labels_ref, valid_ref,
                text_ref, mask_ref, *refs):
    ids_ref, dsamples_ref, dtau_ref = (
        refs if len(refs) == 3 else (None, refs[0], refs[1])
    )
    emb, rs, logits = _tile_logits(samples_ref, text_ref, mask_ref,
                                   inv_temp_ref[0])
    m = jnp.max(logits, axis=0, keepdims=True)  # [1, TN]
    e = jnp.exp(logits - m)
    inv_z = 1.0 / jnp.sum(e, axis=0, keepdims=True)  # [1, TN]

    C, TN = logits.shape
    ids_col = _row_ids(ids_ref, C)  # [C, 1]

    # Multi-slot generalization (see _fwd_kernel): with per-row weight sum
    # W = sum_s w_s,  d logits = p * W - sum_s w_s * onehot_s,  and
    # d logtau = sum_s w_s * picked_s - W * E_p[logits].  The softmax p is
    # never materialized (p*W == e * (W/Z)) and the slot one-hots correct
    # ``delta`` in place — two fewer [C, TN] f32 tiles live than the naive
    # form, which is what bounds the backward's row tile in VMEM.
    S = labels_ref.shape[0]
    # wsum needs no [C, TN] work — accumulate it first so delta can start
    # from e * (W/Z) and ONE slot loop computes each onehot once (the
    # two-loop form recomputed every [C, TN] compare; merging drops S full
    # VPU passes over the score tile).
    wsum = jnp.zeros((1, TN), jnp.float32)
    for s in range(S):
        wsum = wsum + coeff_ref[0] * valid_ref[s, :][None, :]

    delta = e * (wsum * inv_z)
    wpick = jnp.zeros((1, TN), jnp.float32)
    for s in range(S):
        onehot = ids_col == labels_ref[s, :][None, :]  # [C, TN]
        w = coeff_ref[0] * valid_ref[s, :][None, :]  # [1, TN]
        wpick = wpick + w * jnp.sum(jnp.where(onehot, logits, 0.0), axis=0,
                                    keepdims=True)
        delta = delta - jnp.where(onehot, w, 0.0)

    # No mask select needed: masked columns have logits == NEG_INF (finite,
    # -1e30), so e == exp(NEG_INF - m) underflows to exactly 0 and
    # e * logits is -0.0 — the sum is bit-identical to the masked form.
    exp_logit = jnp.sum(e * logits, axis=0, keepdims=True) * inv_z
    dtau_ref[:] = wpick - wsum * exp_logit

    # d samples through logits and the L2 normalize (same bf16-operand
    # MXU rule as the forward — see _tile_logits).  The contraction runs
    # over the class/sublane axis of both operands: delta [C, TN] x
    # text [C, D] -> [TN, D].
    d_emb = jax.lax.dot_general(
        delta.astype(text_ref.dtype), text_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp_ref[0]  # [TN, D]
    proj = jnp.sum(emb * d_emb, axis=1, keepdims=True)
    d = (rs * (d_emb - emb * proj)).astype(dsamples_ref.dtype)
    dsamples_ref[:] = d.reshape(dsamples_ref.shape)


def _mm_dtype(samples):
    """MXU operand dtype for the scoring matmuls.

    bf16 training (the perf mode) scores with bf16 operands and f32
    accumulation — the text table rows and the normalized pixel rows are
    rounded to bf16 before the dot, which is how XLA lowers a bf16 matmul
    anyway; an all-f32 matmul costs several MXU passes per tile.  fp32
    samples (the parity mode) keep the all-f32 matmul: numerics are
    bit-identical to the pre-bf16 kernel.  ``RANGECLIP_CE_MATMUL`` forces
    ``f32`` or ``bf16`` for A/B measurement.
    """
    import os

    forced = os.environ.get("RANGECLIP_CE_MATMUL", "auto")
    if forced == "f32":
        return jnp.float32
    if forced == "bf16":
        return jnp.bfloat16
    return (jnp.bfloat16 if samples.dtype == jnp.bfloat16 else jnp.float32)


def _rows_per_block(H: int, W: int, prefer: int = 2, C: int = 512,
                    ascending: bool = False, max_rows: int | None = None):
    """Rows per 4-D block: the flat row tile rh*W must be a 128-lane
    multiple (Mosaic block constraint) and stay VMEM-friendly.  The forward
    prefers larger tiles (one pass, per-grid-step overhead dominates); the
    backward is VMEM-bound (scores + weighted-onehot + dsamples tiles live
    together), so the two passes choose independently
    (RANGECLIP_CE_ROWS_{FWD,BWD} override).
    When ``prefer`` violates a constraint the fallback scan direction
    matters: the VMEM-bound backward wants the SMALLEST valid tile
    (ascending=True), the grid-overhead-bound forward the largest.  At
    224^2 the native field W=112 makes rh=2 lane-invalid (224 % 128 != 0)
    — a descending fallback there picked rh=16, whose [1792, C] backward
    tiles are Mosaic-VMEM-rejected on chip at C=256 (measured 2026-08-20;
    rh=8 compiles at C in {128, 256, 512}).
    None -> no valid rh, caller falls back to the flat path."""
    # Row cap scales inversely with the class count (large label tables
    # shrink the tile instead of blowing VMEM; 2048 rows at C=512 is a
    # 4 MB score tile).
    if max_rows is None:
        max_rows = max((2048 * 512) // max(C, 512) // 128 * 128, 128)
    order = range(1, min(H, 16) + 1) if ascending else \
        range(min(H, 16), 0, -1)
    candidates = [prefer] + list(order)
    for rh in candidates:
        if rh >= 1 and H % rh == 0 and (rh * W) % 128 == 0 and rh * W <= max_rows:
            return rh
    return None


def _fwd_rows(H: int, W: int, C: int = 512):
    import os

    # Probe result (experiments/ce_rows_probe.py, on chip): the forward is
    # bound by the [N, D] field work — its time is INVARIANT to both C and
    # the row tile (full-C rh=8 7.07 ms == packed rh=16 6.76 ms isolated;
    # don't chase it with tiling).  rh=16 is still worth the free ~0.3 ms
    # where the packed class axis (C <= 256) leaves the VMEM headroom;
    # rh=16 at C=512 also compiles but measures as noise, so the full-C
    # default stays at the long-standing 8.
    default = 16 if C <= 256 else 8
    return _rows_per_block(
        H, W, int(os.environ.get("RANGECLIP_CE_ROWS_FWD", str(default))),
        C=C)


def _bwd_rows(H: int, W: int, C: int = 512):
    import os

    # The backward's VMEM-bound row cap scales inversely with the class
    # axis: the packed-contrast form (C=K=128) frees 4x the score/onehot
    # tile budget vs full-C.  The envelope notes below were measured on
    # the ROW-MAJOR kernels (2026-08-20 probes): flat tiles TN=rh*W up to
    # 1024 compile for C <= 512 (TN=1792 @ C=256 and TN=2048 @ C=128
    # REJECTED), TN=256 @ C in {1024, 2048} compiles.  The CLASS-MAJOR
    # rewrite is VMEM-cheaper (bwd rh=16 @ K=128 now compiles AND
    # measures a wash vs rh=8 — 4.858 vs 4.865 ms isolated,
    # experiments/ce_ablate_probe.py), so the row-major caps remain
    # valid-and-conservative; the shipped canonical grid is re-certified
    # off-chip by tests/test_tpu_lowering.py.  The default prefers the
    # long-measured anchors (rh=8 @ C<=128, rh=2 otherwise) and, when W
    # makes those lane-invalid (224^2 -> W=112), falls back ASCENDING to
    # the smallest valid tile within the envelope — or None (flat path)
    # if nothing fits.
    default = 8 if C <= 128 else 2
    cap = 1024 if C <= 512 else 256
    return _rows_per_block(
        H, W, int(os.environ.get("RANGECLIP_CE_ROWS_BWD", str(default))),
        C=C, ascending=True, max_rows=cap)


def _as_slots(labels, valid):
    """Labels/valid [N] -> [1, N]; [S, N] passes through."""
    if labels.ndim == 1:
        labels = labels[None]
    if valid.ndim == 1:
        valid = valid[None]
    return labels, valid


def _pad_inputs(samples, labels, valid, tile_n):
    N = samples.shape[0]
    pad = (-N) % tile_n
    if pad:
        samples = jnp.pad(samples, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return samples, labels, valid, N


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_pixel_text_ce(
    samples: jax.Array,
    temperature: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    text_normalized: jax.Array,
    contrast_mask: jax.Array,
    tile_n: int = 512,
    interpret: bool = False,
    class_ids: jax.Array | None = None,
) -> jax.Array:
    """sum_i valid_i * CE_i — the caller divides by n_valid and gates.

    Args:
      samples: [N, D] un-normalized pixel embeddings (any float dtype) — or
        the [B, H, W, D] field directly (N = B*H*W row-major), which avoids
        the physical relayout XLA inserts for the flat view (~28 ms/step at
        the canonical config).
      temperature: scalar (traced); logits = cos-sim / temperature.
      labels: [N] int32 target classes — or [S, N] label SLOTS: sample i
        contributes sum_s valid[s, i] * CE(logits_i, labels[s, i]).  Slots
        implement native-resolution training exactly: one decoder pixel
        carries the labels of its nearest-upsample children.
      valid: [N] (or [S, N]) float32 weights (0 = background).
      text_normalized: [C, D] L2-normalized rows; shipped to the kernel in
        the MXU operand dtype (_mm_dtype): bf16 when ``samples`` is bf16
        (native-MXU matmul, f32 accumulation), f32 otherwise (bit-identical
        parity mode).
      contrast_mask: [C] bool contrast-set membership.
      class_ids: optional [C] int32 GLOBAL class id per table row — the
        packed-contrast form, where ``text_normalized`` is a gathered
        fixed-capacity member table (see the module docstring).  Padded
        slots must carry an id >= the global class count (no label
        matches) and contrast_mask 0.  Default: row i is class i.
    """
    return _ce_forward(samples, temperature, labels, valid, text_normalized,
                       contrast_mask, tile_n, interpret, class_ids)


def _specs_and_grid(samples, tile_n, rows_fn=None, C=512):
    """(grid, samples_spec, row_tile, n_padded) for flat or 4-D samples."""
    if samples.ndim == 4:
        B, H, W, D = samples.shape
        rh = (rows_fn or _fwd_rows)(H, W, C=C)
        hb = H // rh
        return (
            (B * hb,),
            pl.BlockSpec((1, rh, W, D), lambda i, hb=hb: (i // hb, i % hb, 0, 0),
                         memory_space=pltpu.VMEM),
            rh * W,
            B * H * W,
        )
    n_padded = samples.shape[0]
    D = samples.shape[1]
    return (
        (n_padded // tile_n,),
        pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        tile_n,
        n_padded,
    )


def _ce_forward(samples, temperature, labels, valid, text_normalized,
                contrast_mask, tile_n, interpret, class_ids=None):
    labels, valid = _as_slots(labels, valid)
    S = labels.shape[0]
    C_classes = text_normalized.shape[0]
    if samples.ndim == 4 and _fwd_rows(*samples.shape[1:3],
                                       C=C_classes) is None:
        samples = samples.reshape(-1, samples.shape[-1])
    if samples.ndim == 4:
        samples_p, labels_p, valid_p = samples, labels, valid
        assert labels.shape[1] == samples.size // samples.shape[-1]
    else:
        samples_p, labels_p, valid_p, _ = _pad_inputs(
            samples, labels, valid, tile_n
        )
    C, D = text_normalized.shape
    grid, samples_spec, row_tile, n_padded = _specs_and_grid(
        samples_p, tile_n, C=C)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_temp [1]
        samples_spec,
        pl.BlockSpec((S, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    operands = [
        (1.0 / temperature).astype(jnp.float32).reshape(1),
        samples_p,
        labels_p.astype(jnp.int32),
        valid_p.astype(jnp.float32),
        text_normalized.astype(_mm_dtype(samples)),
        contrast_mask.astype(jnp.int32),
    ]
    if class_ids is not None:
        in_specs.append(pl.BlockSpec((C, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(class_ids.astype(jnp.int32).reshape(C, 1))

    ce = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, row_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_padded), jnp.float32),
        interpret=interpret,
    )(*operands)
    return jnp.sum(ce)


def _ce_fwd_rule(samples, temperature, labels, valid, text_normalized,
                 contrast_mask, tile_n, interpret, class_ids=None):
    out = _ce_forward(samples, temperature, labels, valid, text_normalized,
                      contrast_mask, tile_n, interpret, class_ids)
    return out, (samples, temperature, labels, valid, text_normalized,
                 contrast_mask, class_ids)


def _ce_bwd_rule(tile_n, interpret, residuals, g):
    (samples, temperature, labels, valid, text_normalized, contrast_mask,
     class_ids) = residuals
    orig_shape = samples.shape
    labels2, valid2 = _as_slots(labels, valid)
    S = labels2.shape[0]
    C_classes = text_normalized.shape[0]
    if samples.ndim == 4 and _bwd_rows(*samples.shape[1:3],
                                       C=C_classes) is None:
        samples = samples.reshape(-1, samples.shape[-1])
    if samples.ndim == 4:
        samples_p, labels_p, valid_p = samples, labels2, valid2
        N = samples.size // samples.shape[-1]
    else:
        samples_p, labels_p, valid_p, N = _pad_inputs(
            samples, labels2, valid2, tile_n
        )
    C, D = text_normalized.shape
    grid, samples_spec, row_tile, n_padded = _specs_and_grid(
        samples_p, tile_n, _bwd_rows, C=C)
    dsamples_shape = (
        samples.shape if samples.ndim == 4 else (n_padded, D)
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # inv_temp [1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # coeff [1]
        samples_spec,
        pl.BlockSpec((S, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    operands = [
        (1.0 / temperature).astype(jnp.float32).reshape(1),
        jnp.asarray(g, jnp.float32).reshape(1),
        samples_p,
        labels_p.astype(jnp.int32),
        valid_p.astype(jnp.float32),
        text_normalized.astype(_mm_dtype(samples)),
        contrast_mask.astype(jnp.int32),
    ]
    if class_ids is not None:
        in_specs.append(pl.BlockSpec((C, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(class_ids.astype(jnp.int32).reshape(C, 1))

    dsamples, dtau_rows = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            samples_spec,
            pl.BlockSpec((1, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dsamples_shape, samples.dtype),
            jax.ShapeDtypeStruct((1, n_padded), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    d_samples = dsamples if samples.ndim == 4 else dsamples[:N]
    d_samples = d_samples.reshape(orig_shape)
    # d temperature: chain d logtau -> d temp  (logtau = log temp)
    d_temp = jnp.sum(dtau_rows) / temperature
    zeros_f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (
        d_samples,
        jnp.asarray(d_temp, jnp.asarray(temperature).dtype).reshape(
            jnp.shape(temperature)
        ),
        zeros_f0(labels),
        jnp.zeros_like(valid),
        jnp.zeros_like(text_normalized),
        zeros_f0(contrast_mask),
        None if class_ids is None else zeros_f0(class_ids),
    )


fused_pixel_text_ce.defvjp(_ce_fwd_rule, _ce_bwd_rule)
