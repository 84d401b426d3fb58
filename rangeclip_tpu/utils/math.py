"""Small numerical helpers shared across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` with torch ``F.normalize`` semantics:
    x / max(||x||_2, eps).  (Unlike x * rsqrt(sum + eps), this is exact for
    well-scaled inputs and matches torch bit-for-bit at fp32.)
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def lower_median(x: jax.Array) -> jax.Array:
    """torch.median semantics for even-length inputs: the *lower* of the two
    middle order statistics (numpy/jnp.median averages them instead).

    Used by depth normalization (reference dataloader.py:49) — parity with
    torch requires the lower median.
    """
    flat = jnp.sort(x.reshape(-1))
    n = flat.shape[0]
    return flat[(n - 1) // 2]
