"""Weighted regression losses.

Reference: utils/src/loss_utils.py — validity-weighted L1/L2 losses used by
the shared depth-completion utilities (weight w masks invalid pixels; the
mean runs over the weighted count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_l1_loss(src: jax.Array, tgt: jax.Array, w: jax.Array) -> jax.Array:
    num = jnp.sum(w * jnp.abs(tgt - src))
    den = jnp.maximum(jnp.sum(w), 1.0)
    return num / den


def weighted_l2_loss(src: jax.Array, tgt: jax.Array, w: jax.Array) -> jax.Array:
    num = jnp.sum(w * jnp.square(tgt - src))
    den = jnp.maximum(jnp.sum(w), 1.0)
    return num / den


def smoothness_loss_weighted(predict: jax.Array, image: jax.Array) -> jax.Array:
    """Edge-aware smoothness: TV of the prediction weighted by image-gradient
    magnitude (the standard depth-completion regularizer shape)."""
    pred_dy = jnp.abs(predict[:, 1:, :, :] - predict[:, :-1, :, :])
    pred_dx = jnp.abs(predict[:, :, 1:, :] - predict[:, :, :-1, :])
    img_dy = jnp.mean(jnp.abs(image[:, 1:, :, :] - image[:, :-1, :, :]),
                      axis=-1, keepdims=True)
    img_dx = jnp.mean(jnp.abs(image[:, :, 1:, :] - image[:, :, :-1, :]),
                      axis=-1, keepdims=True)
    wy = jnp.exp(-img_dy)
    wx = jnp.exp(-img_dx)
    return jnp.mean(wy * pred_dy) + jnp.mean(wx * pred_dx)
