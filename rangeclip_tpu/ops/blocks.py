"""Flax NN blocks mirroring the reference op library's semantics.

TPU-native equivalents of every block in ``utils/src/net_utils.py`` (layer
inventory at SURVEY.md section 2.1): Conv2d (:51), DepthwiseSeparableConv2d
(:144), AtrousConv2d (:256), TransposeConv2d (:350), UpConv2d (:441),
FullyConnected (:502), ResNetBlock (:572), ResNetBottleneckBlock (:670),
AtrousResNetBlock (:779), VGGNetBlock (:878), AtrousVGGNetBlock (:961),
AtrousSpatialPyramidPooling (:1045), SpatialPyramidPooling (:1159),
DecoderBlock (:1272).

Conventions (TPU-first, intentionally different from the torch reference):
  * NHWC layout.  Kernels are HWIO (XLA native) so convs tile directly onto
    the MXU without layout transposes.
  * ``train: bool`` is a static argument; BatchNorm uses flax's
    ``batch_stats`` collection (momentum 0.9 == torch momentum 0.1,
    eps 1e-5).  ``bn_axis_name`` optionally syncs BN statistics across a
    mesh axis (the reference's DDP uses per-replica BN; cross-replica sync
    is a documented improvement, identical on a single device).
  * Weight init reproduces torch's distributions (see initializers.py).
  * All blocks take an optional compute ``dtype`` (bf16 policy) with fp32
    params.

Behavioral notes preserved from the reference:
  * Conv2d applies conv(bias=False, pad=k//2) -> BN/IN -> activation.
  * ResNet blocks apply the 1x1 projection to the identity branch only when
    spatial or channel shapes mismatch (net_utils.py:658-668); this is a
    static shape decision here, resolved at trace time.
  * TransposeConv2d uses stride 2, padding k//2, output_padding 1 (exact
    doubling); DecoderBlock's upsampler uses kernel 2, stride 2, padding 0
    with bias (decoder.py:153).  Both are implemented as fractionally-strided
    convolutions via lax.conv_general_dilated for bit-exact torch parity.
    Measured alternative (rejected): the k==stride case as a 1x1 matmul +
    depth-to-space reshape is bit-identical AND up to 1.8x faster in
    isolation at high resolution, but measured 3.5% SLOWER on the full
    bench predict (4231 vs 4387 maps/s, back-to-back processes) — the
    reshape/transpose fuses worse with the downstream concat+convs than
    XLA's dilated-conv lowering, and it perturbs bf16 near-tie labels.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeclip_tpu.ops.activations import resolve_activation
from rangeclip_tpu.ops.initializers import (
    conv_kernel_init,
    conv_transpose_kernel_init,
    dense_kernel_init,
    torch_default_bias_init,
)
from rangeclip_tpu.ops.resize import resize_nearest, resize_bilinear_align_corners

Dtype = Any
ActivationArg = Union[str, Callable[[jax.Array], jax.Array], None]

DEFAULT_ACTIVATION = "leaky_relu_010"


def _default_act(x: jax.Array) -> jax.Array:
    # net_utils block default: LeakyReLU(negative_slope=0.10)
    return jax.nn.leaky_relu(x, negative_slope=0.10)


def _resolve(act: ActivationArg):
    if act == DEFAULT_ACTIVATION:
        return _default_act
    return resolve_activation(act)


class _NormAct(nn.Module):
    """BatchNorm/InstanceNorm followed by activation (shared epilogue)."""

    use_batch_norm: bool = False
    use_instance_norm: bool = False
    activation: ActivationArg = DEFAULT_ACTIVATION
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert not (self.use_batch_norm and self.use_instance_norm), (
            "Unable to apply both batch and instance normalization"
        )
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name="batch_norm",
            )(x)
        elif self.use_instance_norm:
            # torch InstanceNorm2d defaults: eps 1e-5, no affine, no running stats
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        act = _resolve(self.activation)
        if act is not None:
            x = act(x)
        return x


class Conv2d(nn.Module):
    """Conv(pad=k//2, no bias) -> optional BN/IN -> activation.

    Reference: utils/src/net_utils.py:51-142.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        p = self.kernel_size // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=False,
            kernel_init=conv_kernel_init(
                self.weight_initializer, in_ch, self.features, self.kernel_size
            ),
            dtype=self.dtype,
            name="conv",
        )(x)
        return _NormAct(
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            activation=self.activation,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="norm_act",
        )(x, train=train)


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise k x k conv + pointwise 1x1 conv, then BN/IN + activation.

    Reference: utils/src/net_utils.py:144-255.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        p = self.kernel_size // 2
        x = nn.Conv(
            features=in_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=in_ch,
            use_bias=False,
            kernel_init=conv_kernel_init(
                self.weight_initializer, in_ch, in_ch, self.kernel_size, groups=in_ch
            ),
            dtype=self.dtype,
            name="conv_depthwise",
        )(x)
        x = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=False,
            kernel_init=conv_kernel_init(self.weight_initializer, in_ch, self.features, 1),
            dtype=self.dtype,
            name="conv_pointwise",
        )(x)
        return _NormAct(
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            activation=self.activation,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="norm_act",
        )(x, train=train)


class AtrousConv2d(nn.Module):
    """Dilated conv (padding == dilation, stride 1) -> BN/IN -> activation.

    Reference: utils/src/net_utils.py:256-349.
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        d = self.dilation
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(1, 1),
            padding=[(d, d), (d, d)],
            kernel_dilation=(d, d),
            use_bias=False,
            kernel_init=conv_kernel_init(
                self.weight_initializer, in_ch, self.features, self.kernel_size
            ),
            dtype=self.dtype,
            name="conv",
        )(x)
        return _NormAct(
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            activation=self.activation,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="norm_act",
        )(x, train=train)


def conv_transpose_2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int,
    padding: int,
    output_padding: int,
    dtype: Optional[Dtype] = None,
) -> jax.Array:
    """Exact torch ConvTranspose2d as a fractionally-strided convolution.

    ``kernel`` has shape (kh, kw, in_ch, out_ch).  Identity used:
    ConvTranspose(x, W) == Conv(lhs_dilate(x, s), flip_hw(W)) with padding
    lo = k-1-p and hi = k-1-p+output_padding on each spatial dim.
    """
    k = kernel.shape[0]
    plo = k - 1 - padding
    phi = k - 1 - padding + output_padding
    rhs = jnp.flip(kernel, axis=(0, 1))
    if dtype is not None:
        x = x.astype(dtype)
        rhs = rhs.astype(dtype)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding=[(plo, phi), (plo, phi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TransposeConv2d(nn.Module):
    """Stride-2 transposed conv (pad k//2, output_padding 1, no bias) ->
    BN/IN -> activation.  Exactly doubles spatial dims.

    Reference: utils/src/net_utils.py:350-440.
    """

    features: int
    kernel_size: int = 3
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            conv_transpose_kernel_init(self.weight_initializer, in_ch, self.features, k),
            (k, k, in_ch, self.features),
        )
        x = conv_transpose_2d(
            x, kernel, stride=2, padding=k // 2, output_padding=1, dtype=self.dtype
        )
        return _NormAct(
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            activation=self.activation,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="norm_act",
        )(x, train=train)


class UpConv2d(nn.Module):
    """Nearest-neighbor upsample to a target shape followed by Conv2d.

    Reference: utils/src/net_utils.py:441-501.
    """

    features: int
    kernel_size: int = 3
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, shape: Tuple[int, int], train: bool = False
    ) -> jax.Array:
        x = resize_nearest(x, shape)
        return Conv2d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=1,
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)


class FullyConnected(nn.Module):
    """Linear (with torch-default bias) -> activation -> optional dropout.

    Reference: utils/src/net_utils.py:502-571.
    """

    features: int
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    dropout_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, *, dropout_rng: Optional[jax.Array] = None
    ) -> jax.Array:
        in_features = x.shape[-1]
        x = nn.Dense(
            features=self.features,
            use_bias=True,
            kernel_init=dense_kernel_init(self.weight_initializer, in_features, self.features),
            bias_init=torch_default_bias_init(in_features),
            dtype=self.dtype,
            name="linear",
        )(x)
        act = _resolve(self.activation)
        if act is not None:
            x = act(x)
        if 0.0 < self.dropout_rate <= 1.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(
                x, rng=dropout_rng
            )
        return x


class ResNetBlock(nn.Module):
    """Basic ResNet block: act(conv2(conv1(x)) + proj?(x)).

    The 1x1 projection on the identity branch is applied only when spatial or
    channel shapes mismatch — a static, trace-time decision here.

    Reference: utils/src/net_utils.py:572-668.
    """

    features: int
    stride: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        conv1 = Conv2d(self.features, 3, self.stride, name="conv1", **common)(x, train)
        conv2_cls = DepthwiseSeparableConv2d if self.use_depthwise_separable else Conv2d
        conv2 = conv2_cls(self.features, 3, 1, name="conv2", **common)(conv1, train)

        needs_projection = (self.stride != 1) or (x.shape[-1] != conv2.shape[-1])
        if needs_projection:
            identity = Conv2d(
                self.features,
                kernel_size=1,
                stride=self.stride,
                weight_initializer=self.weight_initializer,
                activation=None,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        else:
            identity = x
        act = _resolve(self.activation)
        return act(conv2 + identity) if act is not None else conv2 + identity


class ResNetBottleneckBlock(nn.Module):
    """Bottleneck block: act(conv3(conv2(conv1(x))) + proj?(x)), conv3 to 4C.

    Reference: utils/src/net_utils.py:670-777.  (The reference decides the
    projection from conv2's shape — a latent bug that only stays hidden
    because the channel counts always mismatch; we decide from the actual
    residual shapes.)
    """

    features: int
    stride: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        conv_cls = DepthwiseSeparableConv2d if self.use_depthwise_separable else Conv2d
        out = Conv2d(self.features, 1, 1, name="conv1", **common)(x, train)
        out = conv_cls(self.features, 3, self.stride, name="conv2", **common)(out, train)
        out = conv_cls(4 * self.features, 1, 1, name="conv3", **common)(out, train)

        needs_projection = (self.stride != 1) or (x.shape[-1] != out.shape[-1])
        if needs_projection:
            identity = Conv2d(
                4 * self.features,
                kernel_size=1,
                stride=self.stride,
                weight_initializer=self.weight_initializer,
                activation=None,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        else:
            identity = x
        act = _resolve(self.activation)
        return act(out + identity) if act is not None else out + identity


class AtrousResNetBlock(nn.Module):
    """ResNet block whose first conv is atrous (stride 1).

    Reference: utils/src/net_utils.py:779-877.
    """

    features: int
    dilation: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        conv1 = AtrousConv2d(self.features, 3, self.dilation, name="conv1", **common)(
            x, train
        )
        conv2_cls = DepthwiseSeparableConv2d if self.use_depthwise_separable else Conv2d
        conv2 = conv2_cls(self.features, 3, 1, name="conv2", **common)(conv1, train)

        if x.shape[-1] != conv2.shape[-1]:
            identity = Conv2d(
                self.features,
                kernel_size=1,
                stride=1,
                weight_initializer=self.weight_initializer,
                activation=None,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        else:
            identity = x
        act = _resolve(self.activation)
        return act(conv2 + identity) if act is not None else conv2 + identity


class VGGNetBlock(nn.Module):
    """(n-1) stride-1 convs followed by one strided conv.

    Reference: utils/src/net_utils.py:878-960.
    """

    features: int
    n_convolution: int = 1
    stride: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        conv_cls = DepthwiseSeparableConv2d if self.use_depthwise_separable else Conv2d
        for n in range(self.n_convolution - 1):
            x = conv_cls(self.features, 3, 1, name=f"conv{n + 1}", **common)(x, train)
        return conv_cls(
            self.features, 3, self.stride, name=f"conv{self.n_convolution}", **common
        )(x, train)


class AtrousVGGNetBlock(nn.Module):
    """(n-1) stride-1 convs followed by one atrous conv.

    Reference: utils/src/net_utils.py:961-1044.
    """

    features: int
    n_convolution: int = 1
    dilation: int = 1
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        conv_cls = DepthwiseSeparableConv2d if self.use_depthwise_separable else Conv2d
        for n in range(self.n_convolution - 1):
            x = conv_cls(self.features, 3, 1, name=f"conv{n + 1}", **common)(x, train)
        return AtrousConv2d(
            self.features, 3, self.dilation, name=f"conv{self.n_convolution}", **common
        )(x, train)


class AtrousSpatialPyramidPooling(nn.Module):
    """Generic ASPP: 1x1 conv + parallel atrous branches + global-pool branch
    (bilinear align_corners upsample), fused by a 1x1 conv.

    Reference: utils/src/net_utils.py:1045-1158.  (The model's own ASPP
    variant with GroupNorm lives in ops/aspp.py; this one mirrors the shared
    library block.)
    """

    features: int
    dilations: Sequence[int] = (6, 12, 18)
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        size = x.shape[1:3]
        branches = [Conv2d(self.features, 1, 1, name="conv1", **common)(x, train)]
        for i, d in enumerate(self.dilations):
            branches.append(
                AtrousConv2d(self.features, 3, d, name=f"atrous_conv{i + 1}", **common)(
                    x, train
                )
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = Conv2d(self.features, 1, 1, name="global_pool_conv", **common)(
            pooled, train
        )
        branches.append(resize_bilinear_align_corners(pooled, size))
        fused = jnp.concatenate(branches, axis=-1)
        return Conv2d(
            self.features,
            kernel_size=1,
            stride=1,
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            dtype=self.dtype,
            name="conv_fuse",
        )(fused, train)


class SpatialPyramidPooling(nn.Module):
    """SPP: per-scale pool -> bilinear upsample -> 1x1 conv, concat with the
    input, fused by two convs.

    Reference: utils/src/net_utils.py:1159-1271.
    """

    features: int
    kernel_sizes: Sequence[int] = (2, 4, 8)
    pool_func: str = "max"
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        size = x.shape[1:3]
        branches = [x]
        for i, k in enumerate(self.kernel_sizes):
            if self.pool_func == "max":
                pooled = nn.max_pool(x, (k, k), strides=(k, k))
            elif self.pool_func == "average":
                pooled = nn.avg_pool(x, (k, k), strides=(k, k))
            else:
                raise ValueError(f"Unsupported pooling function: {self.pool_func}")
            pooled = resize_bilinear_align_corners(pooled, size)
            branches.append(
                Conv2d(self.features, 1, 1, name=f"conv{i + 1}", **common)(pooled, train)
            )
        fused = jnp.concatenate(branches, axis=-1)
        fused = Conv2d(self.features, 3, 1, name="conv_fuse1", **common)(fused, train)
        return Conv2d(
            self.features,
            kernel_size=3,
            stride=1,
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            dtype=self.dtype,
            name="conv_fuse2",
        )(fused, train)


class DecoderBlock(nn.Module):
    """UNet decoder block: ConvTranspose(k2, s2, bias) upsample -> optional
    bilinear resize-to-skip + concat -> two 3x3 convs.

    Reference: RangeCLIP decoder block at utils/src/decoder.py:119-206 (also
    mirrors net_utils.py:1272 in capability).
    """

    features: int
    weight_initializer: str = "kaiming_uniform"
    activation: ActivationArg = DEFAULT_ACTIVATION
    use_batch_norm: bool = False
    use_instance_norm: bool = False
    use_skip: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        in_ch = x.shape[-1]
        # torch ConvTranspose2d(in, out, kernel_size=2, stride=2) with bias
        kernel = self.param(
            "upsample_kernel",
            conv_transpose_kernel_init(self.weight_initializer, in_ch, self.features, 2),
            (2, 2, in_ch, self.features),
        )
        bias = self.param(
            "upsample_bias", torch_default_bias_init(self.features * 4), (self.features,)
        )
        x = conv_transpose_2d(x, kernel, stride=2, padding=0, output_padding=0,
                              dtype=self.dtype)
        x = x + bias.astype(x.dtype)

        if self.use_skip and skip is not None:
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear_align_corners(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)

        common = dict(
            weight_initializer=self.weight_initializer,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            use_instance_norm=self.use_instance_norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        x = Conv2d(self.features, 3, 1, name="conv1", **common)(x, train)
        x = Conv2d(self.features, 3, 1, name="conv2", **common)(x, train)
        return x
