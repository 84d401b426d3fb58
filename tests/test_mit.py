"""MiT (SegFormer-style) encoder variant: shapes + decoder compatibility."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig


def test_mit_unet_forward_shapes():
    cfg = DepthUNetConfig(
        unet_type="mit",
        encoder_filters=(0, 16, 32, 64, 96),  # last 4 become MiT stage dims
        embedding_dim=32,
        use_batch_norm=False,
    )
    model = DepthUNet(cfg)
    x = jnp.ones((1, 64, 64, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    emb, tt, ti = model.apply(variables, x, train=False)
    assert emb.shape == (1, 64, 64, 32)
    norms = np.asarray(jnp.linalg.norm(emb, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(emb)).all()
