"""UNet depth decoder.

Reference: utils/src/decoder.py:24-117 —
  * one DecoderBlock per entry of ``n_filters`` (the reversed encoder filter
    list); the first block has no skip (:46-57), later blocks concat the
    reversed encoder features excluding the deepest (:98-111);
  * a final 3x3 conv to ``embedding_dim`` with no activation (:75-82);
  * nearest-neighbor upsample to the requested output shape and channel-wise
    L2 normalization (:113-116).

NHWC; the returned pixel-embedding field has shape [B, H, W, D].
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeclip_tpu.ops.blocks import Conv2d, DecoderBlock
from rangeclip_tpu.ops.resize import resize_nearest
from rangeclip_tpu.utils.math import l2_normalize


class DepthDecoder(nn.Module):
    n_filters: Sequence[int] = (512, 256, 128, 64, 32)
    embedding_dim: int = 512
    weight_initializer: str = "kaiming_uniform"
    activation: str = "relu"
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        spatial_feature_map: jax.Array,
        encoder_features: List[jax.Array],
        target_shape: Optional[Tuple[int, int]],
        train: bool = False,
        normalize: bool = True,
        apply_head: bool = True,
    ) -> jax.Array:
        """``target_shape=None`` skips the final nearest upsample and returns
        the field at its native resolution (H/2 — the resolution of the last
        decoder block, reference decoder.py:113 before the interpolate at
        :114).  Because the final upsample is *nearest* and every downstream
        consumer is per-pixel (L2 norm, scoring, top-k), computing on the
        native field and nearest-upsampling the result is exact.

        ``normalize=False`` returns the raw output-conv field for consumers
        that fuse the L2 normalization themselves (the Pallas scoring
        kernels) — one full read+write of the field saved per skip.

        ``apply_head=False`` stops before the output conv and returns the
        last block's features [B, H/2, W/2, n_filters[-1]] for consumers
        that fuse the whole head (conv + normalize + scoring,
        ops/pallas/head_topk.py) — the [.., D] field then never exists in
        HBM at all."""
        # Skips are the reversed encoder features minus the deepest one
        # (decoder.py:98): [g3@H/16, g2@H/8, g1@H/4, conv1@H/2] for resnet18.
        skip_features = encoder_features[:-1][::-1]
        assert len(skip_features) == len(self.n_filters) - 1, (
            f"Mismatch in number of skip features and decoder blocks: "
            f"{len(skip_features)} vs {len(self.n_filters) - 1}"
        )

        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )

        x = DecoderBlock(self.n_filters[0], use_skip=False, name="up_block0", **common)(
            spatial_feature_map, None, train
        )
        for i in range(1, len(self.n_filters)):
            x = DecoderBlock(self.n_filters[i], use_skip=True, name=f"up_block{i}", **common)(
                x, skip_features[i - 1], train
            )
        if not apply_head:
            return x

        x = Conv2d(
            self.embedding_dim,
            kernel_size=3,
            stride=1,
            weight_initializer=self.weight_initializer,
            activation=None,
            dtype=self.dtype,
            name="output_conv",
        )(x, train)

        if target_shape is not None:
            x = resize_nearest(x, target_shape)
        if not normalize:
            return x
        # The native-resolution head normalize is a fused Pallas pass on
        # TPU in the bf16 perf mode: it reads the output conv through its
        # native {3,0,2,1} layout and emits the standard layout downstream
        # kernels want, absorbing the relayout XLA would otherwise insert
        # (ops/pallas/l2_normalize.py; measured 69.8 -> 66.4 ms/step at
        # 1x32 @ 256^2, experiments/l2norm_ab.py).  fp32 — the parity
        # mode — keeps the XLA formulation (reduction-order identical to
        # the CPU run); resized full-res fields (target_shape set) keep it
        # too, since their producer layout is not the conv's.
        if target_shape is None and x.dtype == jnp.bfloat16:
            from rangeclip_tpu.ops.pallas.l2_normalize import (
                field_kernel_applicable,
            )
            from rangeclip_tpu.parallel.kernel_shard import (
                local_field_shape,
                sharded_l2_normalize_field,
            )
            from rangeclip_tpu.utils.platform import (
                kernel_interpret,
                use_tpu_kernels,
            )

            # applicability is a PER-SHARD property under a mesh: the
            # kernel sees the local [B/nd, h/ns, W, D] block, so the
            # sublane/VMEM gates check the local shape
            if use_tpu_kernels() and field_kernel_applicable(
                    local_field_shape(x.shape)):
                return sharded_l2_normalize_field(
                    x, interpret=kernel_interpret())
        return l2_normalize(x, axis=-1)
