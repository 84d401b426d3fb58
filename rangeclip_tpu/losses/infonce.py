"""InfoNCE losses with static shapes.

Pixel-text contrastive loss — reference model.py:199-301:
  * sample ``int(0.7*H*W)`` pixel positions per image uniformly WITH
    replacement (torch.randint, model.py:220);
  * drop background pixels (label 0) — here a weight mask instead of a
    dynamic filter (model.py:225-228);
  * build a contrast set: unique sampled GT labels plus k=50 distractors
    split medium/hard/random by the curriculum (model.py:236-268);
  * cross-entropy over normalized pixel x text logits / temperature
    (model.py:289-291).

TPU-native reformulation: the contrast set is a boolean mask over the full
static class axis; CE over the reduced set == CE over full logits with
non-members masked to -inf (identical softmax over the surviving columns).
The distractor draw uses the Gumbel-top-k trick with *dynamic counts as
thresholds* so the curriculum never triggers a recompile.

Area-image contrastive loss — reference model.py:304-326: square InfoNCE
between masked-average-pooled area embeddings and frozen CLIP image
embeddings of the object crops, labels on the diagonal; silently becomes 0
when fewer than 2 valid instances exist (the reference builds a
graph-preserving dummy, model.py:322-326 — unnecessary in JAX where grads of
a 0-weighted term are simply 0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rangeclip_tpu.utils.math import l2_normalize
from rangeclip_tpu.utils.platform import use_tpu_kernels

NEG_INF = jnp.float32(-1e30)


def sample_pixels(
    key: jax.Array,
    pixel_embeddings: jax.Array,
    target: jax.Array,
    percent: float = 0.7,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Uniform with-replacement pixel sampling (model.py:207-228).

    Args:
      pixel_embeddings: [B, H, W, D].
      target: [B, H, W] int labels.
      percent: fraction of H*W to sample (static).

    Returns:
      (samples [B*N, D], labels [B*N], valid [B*N] float32 weight mask with
      0 for background pixels).
    """
    B, H, W, D = pixel_embeddings.shape
    n_total = H * W
    n_samples = max(min(int(percent * n_total), n_total), 1)

    idx = jax.random.randint(key, (B, n_samples), 0, n_total)
    emb_flat = pixel_embeddings.reshape(B, n_total, D)
    tgt_flat = target.reshape(B, n_total)

    samples = jnp.take_along_axis(emb_flat, idx[..., None], axis=1)
    labels = jnp.take_along_axis(tgt_flat, idx, axis=1)
    samples = samples.reshape(B * n_samples, D)
    labels = labels.reshape(B * n_samples)
    valid = (labels > 0).astype(jnp.float32)
    return samples, labels, valid


def sample_pixel_multiplicities(
    key: jax.Array,
    target: jax.Array,
    percent: float = 0.7,
) -> Tuple[jax.Array, jax.Array]:
    """Multiplicity-weighted reformulation of :func:`sample_pixels`.

    Uniform with-replacement sampling followed by the sample mean is
    identical to weighting EVERY pixel by its sampled multiplicity:
      mean_{i in draws, valid} ce_i  ==  sum_p m_p v_p ce_p / sum_p m_p v_p
    where m ~ histogram of the draws.  On TPU this removes the [N, D] row
    gather and its scatter-add adjoint (~15 ms per microbatch at 256^2)
    from the train step — the CE kernel just reads the pixel field in
    place with per-pixel weights.

    Returns: (weights [B*H*W] float32 = multiplicity * (label > 0),
              labels [B*H*W] int32).
    """
    B, H, W = target.shape
    n_total = H * W
    n_samples = max(min(int(percent * n_total), n_total), 1)

    idx = jax.random.randint(key, (B, n_samples), 0, n_total)
    counts = jax.vmap(
        lambda row: jnp.zeros((n_total,), jnp.int32).at[row].add(1)
    )(idx)
    labels = target.reshape(B * n_total)
    weights = counts.reshape(B * n_total).astype(jnp.float32) * (labels > 0)
    return weights, labels


def build_contrast_mask(
    key: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    num_classes: int,
    medium_matrix: jax.Array,
    hard_matrix: jax.Array,
    k_distractors: int = 50,
    pct_medium: jax.Array | float = 0.0,
    pct_hard: jax.Array | float = 0.75,
) -> jax.Array:
    """Contrast-set membership mask over the class axis (model.py:236-268).

    Pool composition mirrors the reference exactly: the medium and hard
    similarity sets of every label present in the samples are pooled
    together (medium sets included only when n_medium > 0, hard only when
    n_hard > 0), GT labels removed, and n_medium + n_hard distractors drawn
    uniformly without replacement (all of the pool if it is smaller); then
    n_rand = k - n_medium - n_hard further distractors are drawn uniformly
    from the remaining classes.

    Args:
      labels / valid: flat sampled labels [N] and their weights [N].
      medium_matrix / hard_matrix: [C, C] bool, row l = similarity set of l
        (see data/labels.py).
      pct_medium / pct_hard: curriculum fractions — may be traced scalars;
        counts become dynamic thresholds, not shapes.

    Returns: [C] bool mask (True = class participates in the softmax).
    """
    C = num_classes
    if use_tpu_kernels():
        # XLA lowers the scatter-max to a serialized path (~4 ms for 180k
        # labels); the tiled compare-reduce kernel is ~40x faster.
        from rangeclip_tpu.ops.pallas.class_presence import fused_class_presence

        present = fused_class_presence(labels, valid, C)
    else:
        present = jnp.zeros((C,), jnp.bool_).at[labels].max(valid > 0)
    present_f = present.astype(jnp.float32)

    k = jnp.float32(k_distractors)
    n_medium = jnp.floor(k * jnp.float32(pct_medium)).astype(jnp.int32)
    n_hard = jnp.floor(k * jnp.float32(pct_hard)).astype(jnp.int32)
    n_rand = k_distractors - n_medium - n_hard

    # Union of similarity sets of present labels: row-select via matmul.
    medium_union = (present_f @ medium_matrix.astype(jnp.float32)) > 0
    hard_union = (present_f @ hard_matrix.astype(jnp.float32)) > 0
    pool = ((medium_union & (n_medium > 0)) | (hard_union & (n_hard > 0))) & ~present

    key_mh, key_rand = jax.random.split(key)

    def draw(pool_mask: jax.Array, n: jax.Array, key: jax.Array) -> jax.Array:
        """Uniform sample without replacement: keep pool members whose Gumbel
        score ranks in the top n (dynamic threshold, static shapes)."""
        g = jax.random.gumbel(key, (C,))
        scores = jnp.where(pool_mask, g, -jnp.inf)
        sorted_desc = -jnp.sort(-scores)
        # Threshold = n-th largest score; n == 0 disables the draw entirely.
        thresh_idx = jnp.clip(n - 1, 0, C - 1)
        thresh = sorted_desc[thresh_idx]
        return pool_mask & (scores >= thresh) & (n > 0)

    chosen_mh = draw(pool, n_medium + n_hard, key_mh)
    rand_pool = ~present & ~chosen_mh
    chosen_rand = draw(rand_pool, n_rand, key_rand)

    return present | chosen_mh | chosen_rand


def pixel_text_infonce(
    samples: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    text_embeddings: jax.Array,
    contrast_mask: jax.Array,
    temperature: jax.Array,
) -> jax.Array:
    """Masked cross-entropy over pixel x text similarities (model.py:271-291).

    Equals CE over the gathered contrast subset: classes outside the mask get
    -inf logits and vanish from the softmax.  Returns 0 when fewer than 2
    contrast classes or no valid samples exist (reference warning paths).

    ``labels``/``valid`` may be flat [N] (one label per sample) or label
    SLOTS [S, N]: sample i contributes sum_s valid[s, i] * CE_i(labels[s, i])
    — the native-resolution training identity where one decoder pixel
    carries the labels of its nearest-upsample children.

    On TPU the normalize -> matmul -> masked-CE chain runs as a fused Pallas
    kernel pair (custom VJP) that never materializes the [N, C] logits in
    HBM (ops/pallas/pixel_text_ce.py); elsewhere it is the XLA formulation
    below.  Both produce identical values and gradients (tests).
    """
    n_contrast = jnp.sum(contrast_mask.astype(jnp.int32))
    n_valid = jnp.sum(valid)
    ok = (n_contrast > 1) & (n_valid > 0)

    if use_tpu_kernels():
        from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

        text_n = l2_normalize(text_embeddings.astype(jnp.float32), axis=-1)
        ce_sum = fused_pixel_text_ce(
            samples, temperature, labels, valid, text_n, contrast_mask
        )
        loss = ce_sum / jnp.maximum(n_valid, 1.0)
        return jnp.where(ok, loss, 0.0)

    if samples.ndim == 4:
        samples = samples.reshape(-1, samples.shape[-1])
    labels2 = labels if labels.ndim == 2 else labels[None]
    valid2 = valid if valid.ndim == 2 else valid[None]

    pred_n = l2_normalize(samples.astype(jnp.float32), axis=-1)
    text_n = l2_normalize(text_embeddings.astype(jnp.float32), axis=-1)
    logits = (
        jnp.einsum("nd,cd->nc", pred_n, text_n, preferred_element_type=jnp.float32)
        / temperature
    )
    logits = jnp.where(contrast_mask[None, :], logits, NEG_INF)

    log_z = jax.nn.logsumexp(logits, axis=-1)
    ce_sum = jnp.float32(0.0)
    for s in range(labels2.shape[0]):
        picked = jnp.take_along_axis(logits, labels2[s][:, None], axis=-1)[:, 0]
        ce_sum = ce_sum + jnp.sum((log_z - picked) * valid2[s])

    loss = ce_sum / jnp.maximum(n_valid, 1.0)
    return jnp.where(ok, loss, 0.0)


def area_image_infonce(
    area_embeddings: jax.Array,
    image_embeddings: jax.Array,
    valid: jax.Array,
    temperature: jax.Array,
) -> jax.Array:
    """Diagonal-label InfoNCE between area and CLIP image embeddings
    (model.py:304-326), with a validity mask over instances.

    Rows/columns of invalid instances are excluded from the softmax; the
    result is identical to running the reference on the packed valid subset.
    Returns 0 when fewer than 2 valid instances.
    """
    area_n = l2_normalize(area_embeddings.astype(jnp.float32), axis=-1)
    img_n = l2_normalize(image_embeddings.astype(jnp.float32), axis=-1)
    logits = (
        jnp.einsum("nd,md->nm", area_n, img_n, preferred_element_type=jnp.float32)
        / temperature
    )
    logits = jnp.where(valid[None, :] > 0, logits, NEG_INF)

    log_z = jax.nn.logsumexp(logits, axis=-1)
    diag = jnp.diagonal(logits)
    ce = log_z - diag

    n_valid = jnp.sum(valid)
    loss = jnp.sum(ce * valid) / jnp.maximum(n_valid, 1.0)
    return jnp.where(n_valid > 1, loss, 0.0)
