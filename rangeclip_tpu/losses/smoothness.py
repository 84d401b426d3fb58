"""Total-variation smoothness regularizer.

Reference: model.py:329-334 — L1 distance between horizontally and
vertically adjacent pixel embeddings (torch F.l1_loss => mean reduction),
summed over the two directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def total_variation_loss(pixel_embeddings: jax.Array) -> jax.Array:
    """pixel_embeddings: [B, H, W, D] (NHWC)."""
    x = pixel_embeddings.astype(jnp.float32)
    tv_h = jnp.mean(jnp.abs(x[:, :, :-1, :] - x[:, :, 1:, :]))
    tv_v = jnp.mean(jnp.abs(x[:, :-1, :, :] - x[:, 1:, :, :]))
    return tv_h + tv_v
