"""Weighted regression losses.

Reference: utils/src/loss_utils.py:9-69 — validity-weighted L1/L2 losses
used by the shared depth-completion utilities.  Reference semantics kept
exactly: the weighted mean is computed PER SAMPLE over the non-batch dims
(``sum(w*loss, dims=[1..]) / sum(w, dims=[1..])``), then averaged across
the batch; ``normalize=True`` divides the elementwise loss by |tgt|+eps
(L1) / tgt^2+eps (L2) first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-8


def _per_sample_weighted_mean(loss: jax.Array, w: jax.Array) -> jax.Array:
    # The denominator sums w WITHOUT broadcasting it to the loss shape —
    # the reference's exact arithmetic (torch.sum(w, dim=[1,2,3]) on an
    # [N,1,H,W] weight against an [N,3,H,W] loss, loss_utils.py:36/67).
    per = (jnp.sum(w * loss, axis=tuple(range(1, loss.ndim)))
           / jnp.sum(w, axis=tuple(range(1, w.ndim))))
    return jnp.mean(per)


def weighted_l1_loss(
    src: jax.Array,
    tgt: jax.Array,
    w: jax.Array = None,
    normalize: bool = False,
) -> jax.Array:
    """Mean over batch of per-sample weighted L1 (loss_utils.py:9-37)."""
    loss = jnp.abs(tgt - src)
    if normalize:
        loss = loss / (jnp.abs(tgt) + EPSILON)
    if w is None:
        w = jnp.ones_like(src)
    return _per_sample_weighted_mean(loss, w)


def weighted_l2_loss(
    src: jax.Array,
    tgt: jax.Array,
    w: jax.Array = None,
    normalize: bool = False,
) -> jax.Array:
    """Mean over batch of per-sample weighted squared error
    (loss_utils.py:39-69)."""
    loss = jnp.square(tgt - src)
    if normalize:
        loss = loss / (jnp.square(tgt) + EPSILON)
    if w is None:
        w = jnp.ones_like(src)
    return _per_sample_weighted_mean(loss, w)


def smoothness_loss_weighted(predict: jax.Array, image: jax.Array) -> jax.Array:
    """Edge-aware smoothness: TV of the prediction weighted by image-gradient
    magnitude (the standard depth-completion regularizer shape; an extension
    beyond the reference's loss_utils.py, which has no smoothness term)."""
    pred_dy = jnp.abs(predict[:, 1:, :, :] - predict[:, :-1, :, :])
    pred_dx = jnp.abs(predict[:, :, 1:, :] - predict[:, :, :-1, :])
    img_dy = jnp.mean(jnp.abs(image[:, 1:, :, :] - image[:, :-1, :, :]),
                      axis=-1, keepdims=True)
    img_dx = jnp.mean(jnp.abs(image[:, :, 1:, :] - image[:, :, :-1, :]),
                      axis=-1, keepdims=True)
    wy = jnp.exp(-img_dy)
    wx = jnp.exp(-img_dx)
    return jnp.mean(wy * pred_dy) + jnp.mean(wx * pred_dx)
