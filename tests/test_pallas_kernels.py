"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeclip_tpu.ops.pallas.pixel_text_topk import fused_pixel_text_topk
from rangeclip_tpu.utils.math import l2_normalize


def test_fused_pixel_text_topk_matches_xla():
    rng = np.random.default_rng(0)
    N, D, C, K = 100, 32, 64, 5
    emb = rng.standard_normal((N, D)).astype(np.float32)
    text = rng.standard_normal((C, D)).astype(np.float32)
    mask = np.zeros(C, bool)
    mask[rng.choice(C, 40, replace=False)] = True

    text_n = np.asarray(l2_normalize(jnp.asarray(text), axis=-1))
    idx, val = fused_pixel_text_topk(
        jnp.asarray(emb), jnp.asarray(text_n), jnp.asarray(mask),
        top_k=K, tile_n=32, interpret=True,
    )

    # XLA reference
    emb_n = np.asarray(l2_normalize(jnp.asarray(emb), axis=-1))
    logits = emb_n @ text_n.T
    logits = np.where(mask[None, :], logits, -1e30)
    want_val, want_idx = jax.lax.top_k(jnp.asarray(logits), K)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(want_val),
                               rtol=1e-5, atol=1e-6)
    # all selected classes are candidates
    assert mask[np.asarray(idx).reshape(-1)].all()
