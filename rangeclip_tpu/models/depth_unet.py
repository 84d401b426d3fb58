"""DepthUNet: depth-map -> per-pixel CLIP-space embedding field.

Reference: RangeCLIP/src/depth_segmentation_model/model.py:59-405 —
  * owns the ResNet encoder + UNet decoder (:80-103);
  * learnable log-temperatures, init log(0.07) text / log(0.1) image
    (:77-78);
  * ``forward`` returns (pixel_embeddings, temp_text, temp_image)
    (:108-117);
  * ``predict`` scores pixels against a reduced candidate set (GT labels
    plus sampled negatives) and returns top-k global label indices
    (:119-175).

TPU-native reformulation of ``predict``: instead of materializing a
dynamically-sized reduced embedding table (torch gathers a python-sorted
index list, model.py:147-161), we score against the FULL static [C, D] table
and mask non-candidate classes to -inf before top-k.  Cross-candidate-set
argmax/top-k over a masked score vector is mathematically identical to
top-k over the gathered subset, but keeps every shape static so the whole
path compiles once and the matmul tiles onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeclip_tpu.models.decoder import DepthDecoder
from rangeclip_tpu.models.encoder import DepthEncoder
from rangeclip_tpu.ops.resize import resize_nearest
from rangeclip_tpu.utils.math import l2_normalize
from rangeclip_tpu.utils.platform import use_tpu_kernels

NEG_INF = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class DepthUNetConfig:
    """Canonical hyperparameters (train_util.py:133-144 + launcher)."""

    unet_type: str = "resnet"
    n_layer: int = 18
    input_channels: int = 1
    encoder_filters: Tuple[int, ...] = (32, 64, 128, 256, 512)
    embedding_dim: int = 512
    weight_initializer: str = "kaiming_uniform"
    activation: str = "relu"
    use_batch_norm: bool = True
    use_instance_norm: bool = False
    temperature_text: float = 0.07
    temperature_image: float = 0.1
    dtype: Optional[Any] = None  # compute dtype; None -> fp32
    bn_axis_name: Optional[str] = None
    # Frozen-encoder finetune (model.py:397: the encoder stays in eval mode
    # while training — BN uses running statistics and never updates them;
    # the optimizer side of the freeze is optax-masked zero updates,
    # training/optim.py make_optimizer(freeze_encoder=True)).
    freeze_encoder: bool = False


class DepthUNet(nn.Module):
    config: DepthUNetConfig = DepthUNetConfig()

    def setup(self):
        cfg = self.config
        if cfg.unet_type == "resnet":
            self.depth_encoder = DepthEncoder(
                n_layer=cfg.n_layer,
                n_filters=cfg.encoder_filters,
                embedding_dim=cfg.embedding_dim,
                weight_initializer=cfg.weight_initializer,
                activation=cfg.activation,
                use_batch_norm=cfg.use_batch_norm,
                use_instance_norm=cfg.use_instance_norm,
                bn_axis_name=cfg.bn_axis_name,
                dtype=cfg.dtype,
            )
            decoder_filters = tuple(reversed(cfg.encoder_filters))
        elif cfg.unet_type == "mit":
            # SegFormer-style transformer encoder variant (BASELINE stretch
            # config); same feature-pyramid contract, 4 stages at H/4..H/32.
            from rangeclip_tpu.models.mit_encoder import MiTConfig, MiTDepthEncoder

            mit_cfg = MiTConfig(embed_dims=tuple(cfg.encoder_filters[-4:]))
            self.depth_encoder = MiTDepthEncoder(
                config=mit_cfg,
                embedding_dim=cfg.embedding_dim,
                dtype=cfg.dtype,
            )
            decoder_filters = tuple(reversed(mit_cfg.embed_dims))
        else:
            raise ValueError(f"Unsupported depth encoder type: {cfg.unet_type}")
        self.depth_decoder = DepthDecoder(
            n_filters=decoder_filters,
            embedding_dim=cfg.embedding_dim,
            weight_initializer=cfg.weight_initializer,
            activation=cfg.activation,
            use_batch_norm=cfg.use_batch_norm,
            use_instance_norm=cfg.use_instance_norm,
            bn_axis_name=cfg.bn_axis_name,
            dtype=cfg.dtype,
        )
        self.log_temperature_text = self.param(
            "log_temperature_text",
            lambda key: jnp.log(jnp.float32(self.config.temperature_text)),
        )
        self.log_temperature_image = self.param(
            "log_temperature_image",
            lambda key: jnp.log(jnp.float32(self.config.temperature_image)),
        )

    def __call__(
        self, depth: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Forward pass.  depth: [B, H, W] or [B, H, W, 1] (NHWC).

        Returns (pixel_embeddings [B, H, W, D], temp_text, temp_image).
        """
        if depth.ndim == 3:
            depth = depth[..., None]
        target_shape = depth.shape[1:3]
        encoder_train = train and not self.config.freeze_encoder
        _, encoder_features, final_feature_map = self.depth_encoder(
            depth, encoder_train
        )
        pixel_embeddings = self.depth_decoder(
            final_feature_map, encoder_features, target_shape, train
        )
        return (
            pixel_embeddings,
            jnp.exp(self.log_temperature_text),
            jnp.exp(self.log_temperature_image),
        )

    def embed(self, depth: jax.Array, train: bool = False) -> jax.Array:
        """Pixel embeddings only (inference helper)."""
        return self(depth, train)[0]

    def forward_native(
        self, depth: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Forward pass WITHOUT the final nearest upsample: the normalized
        field at the decoder's native resolution [B, H/2, W/2, D].

        The full-resolution field is exactly the nearest x2 upsample of
        this one (decoder.py:79 + reference decoder.py:113-116), so the
        training losses consume it directly via the upsample identities
        (losses/hybrid.py label_upsample) — same losses/gradients, ~4x
        less HBM traffic in the train step.
        """
        if depth.ndim == 3:
            depth = depth[..., None]
        encoder_train = train and not self.config.freeze_encoder
        _, encoder_features, final_feature_map = self.depth_encoder(
            depth, encoder_train
        )
        pixel_embeddings = self.depth_decoder(
            final_feature_map, encoder_features, None, train
        )
        return (
            pixel_embeddings,
            jnp.exp(self.log_temperature_text),
            jnp.exp(self.log_temperature_image),
        )

    def native_field(
        self, depth: jax.Array, normalize: bool = True
    ) -> jax.Array:
        """Native-resolution embedding field [B, H/2, W/2, D], optionally
        skipping the channel L2 normalization (``normalize=False``) for
        consumers that fuse it themselves — the same contract `predict`
        uses internally for the Pallas scoring path (the kernel normalizes
        once, in registers)."""
        if depth.ndim == 3:
            depth = depth[..., None]
        _, encoder_features, final_feature_map = self.depth_encoder(depth, False)
        return self.depth_decoder(
            final_feature_map, encoder_features, None, False,
            normalize=normalize,
        )

    def decode_features(self, depth: jax.Array) -> jax.Array:
        """Pre-head decoder features [B, H/2, W/2, n_filters[-1]] — the
        input to the output conv (decoder.py:75-82).  Feed these to
        :func:`predict_topk_fused`, which fuses conv + normalize + scoring
        + top-k into one Pallas kernel."""
        if depth.ndim == 3:
            depth = depth[..., None]
        _, encoder_features, final_feature_map = self.depth_encoder(depth, False)
        return self.depth_decoder(
            final_feature_map, encoder_features, None, False, apply_head=False
        )

    def predict(
        self,
        depth: jax.Array,
        candidate_text_embeddings: jax.Array,
        candidate_mask: jax.Array,
        top_k: int = 5,
        scoring: str = "auto",
        score_native: bool = True,
        return_embeddings: bool = True,
        candidate_indices: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Reduced-candidate top-k prediction (model.py:119-175).

        Args:
          depth: [B, H, W(, 1)] depth maps.
          candidate_text_embeddings: full text table [C, D] (unnormalized).
          candidate_mask: [C] bool — True for classes in the reduced set
            (GT labels + sampled negatives); build it with
            :func:`build_candidate_mask`.  Ignored (may be None) when
            ``candidate_indices`` is given.
          candidate_indices: optional [S] int32, ascending candidate class
            ids padded with -1 (:func:`build_candidate_indices`).  When
            given, scoring GATHERS the S candidate rows of the text table
            first — the reference's own formulation (model.py:147-161) —
            so the matmul and the top-k passes run over S slots instead of
            all C classes (~25% less scoring work at the canonical
            C=512 / 300-negative config).  Because the slots are in
            ascending class order, min-index tie-breaking matches the
            masked path exactly: the two paths return bit-identical labels
            (tested).  S must bound |unique GT labels| + num_negatives.
          top_k: number of top labels per pixel.
          scoring: 'pallas' (fused VMEM-resident score+top-k kernel — the
            TPU fast path; lax.top_k over the [B*H*W, C] logits is ~50x
            slower), 'xla', or 'auto' (pallas on TPU, xla elsewhere).
          score_native: score at the decoder's native resolution (H/2) and
            nearest-upsample the top-k *indices* to [H, W].  The reference's
            final upsample is nearest (decoder.py:113-116) and normalize /
            scoring / top-k are all per-pixel, so this is EXACTLY the same
            prediction as scoring at full resolution with ~4x fewer scoring
            FLOPs and no [B, H, W, D] field materialization
            (tests/test_model_and_train.py proves the identity).  ``False``
            reproduces the literal full-resolution scoring order.
          return_embeddings: also return the full-resolution L2-normalized
            pixel-embedding field.  ``False`` skips materializing it (the
            serving/bench hot path needs only the labels) and returns the
            native-resolution field instead — un-normalized on the Pallas
            path, where the kernel fuses the normalization and the HBM
            round-trip of a normalized field is exactly what's being saved.
            ``"native"`` returns the L2-NORMALIZED field at native
            resolution — what the native-resolution loss path consumes
            (evals/validate.py + hybrid.py label_upsample).

        Returns:
          (topk_pred_indices [B, H, W, k] int32 in the global label space,
           pixel_embeddings L2-normalized — [B, H, W, D] when
           ``return_embeddings`` else the native [B, H/2, W/2, D] field,
           temperature_text scalar).
        """
        if depth.ndim == 3:
            depth = depth[..., None]
        target_shape = depth.shape[1:3]
        if scoring == "auto":
            scoring = (
                "pallas" if use_tpu_kernels() else "xla"
            )
        _, encoder_features, final_feature_map = self.depth_encoder(depth, False)
        # The Pallas kernel fuses the pixel L2-normalization, so the decoder
        # hands it the raw field — normalizing exactly once either way (the
        # reference normalizes in the decoder AND again in predict,
        # decoder.py:116 + model.py:144; at fp32 the re-normalization is a
        # no-op, proven by the fp32 parity tests running the single-normalize
        # XLA path against torch's double-normalize).
        pixel_embeddings = self.depth_decoder(
            final_feature_map,
            encoder_features,
            None if score_native else target_shape,
            False,
            normalize=(scoring != "pallas"),
        )
        temp_text = jnp.exp(self.log_temperature_text)

        if candidate_indices is not None:
            # Gathered reduced table (model.py:147-161): one [S, D] gather
            # replaces C-S dead classes in every downstream matmul/top-k.
            table = candidate_text_embeddings[
                jnp.maximum(candidate_indices, 0)
            ]
            candidate_mask = candidate_indices >= 0
        else:
            table = candidate_text_embeddings
        text = l2_normalize(table.astype(jnp.float32), axis=-1)

        B, H, W, D = pixel_embeddings.shape
        if scoring == "pallas":
            from rangeclip_tpu.ops.pallas.pixel_text_topk import (
                fused_pixel_text_topk,
            )

            # XLA's conv emits the field with layout {3,0,2,1} — memory
            # order (H, W, B, D) — while the Pallas operand needs a
            # standard layout, which on [B, H, W, D] costs a full physical
            # relayout copy (~1.6 ms at the canonical bench config).  The
            # logical [H, W, B, D] view of that same buffer IS
            # standard-layout, so scoring the transposed field makes the
            # transpose a free relabeling instead of a copy; per-pixel
            # scoring/top-k is order-agnostic and the index map back to
            # [B, H, W, k] is folded into the output reshape.
            field_t = jnp.transpose(pixel_embeddings, (1, 2, 0, 3))
            # the kernel emits global class ids itself (candidate_ids) —
            # an XLA [N, k] gather remap costs ~86 ms at the canonical
            # predict config, 3x the whole kernel
            idx, _ = fused_pixel_text_topk(
                field_t,
                text.astype(pixel_embeddings.dtype),
                candidate_mask,
                top_k=top_k,
                want_values=False,
                candidate_ids=candidate_indices,
            )
            topk_indices = idx.reshape(H, W, B, top_k).transpose(2, 0, 1, 3)
            if return_embeddings:  # True or "native"
                pixel_embeddings = l2_normalize(pixel_embeddings, axis=-1)
        else:
            logits = jnp.einsum(
                "bhwd,cd->bhwc",
                pixel_embeddings.astype(jnp.float32),
                text,
                preferred_element_type=jnp.float32,
            )
            logits = jnp.where(candidate_mask[None, None, None, :], logits, NEG_INF)
            topk_vals, topk_indices = jax.lax.top_k(logits, top_k)
            if candidate_indices is not None:
                # slot -> global class id.  Only the XLA branch needs this
                # remap — the Pallas kernel emits global ids directly
                # (candidate_ids above).
                topk_indices = jnp.take(candidate_indices, topk_indices,
                                        axis=0)
            # Exhausted candidate set (fewer candidates than top_k): the
            # remaining picks tie at NEG_INF and would emit arbitrary
            # (possibly duplicate / non-candidate) slots — emit the -1
            # no-candidate sentinel instead, matching the Pallas kernels
            # and predict_folded.  (The reference would crash here:
            # torch.topk(k) over a smaller candidate list.)
            topk_indices = jnp.where(topk_vals > -1e29, topk_indices, -1)

        if (H, W) != target_shape:
            topk_indices = resize_nearest(topk_indices, target_shape)
            if return_embeddings is True:
                pixel_embeddings = resize_nearest(pixel_embeddings, target_shape)
        return topk_indices, pixel_embeddings, temp_text


def predict_topk_fused(
    model: DepthUNet,
    variables,
    depth: jax.Array,
    candidate_text_embeddings: jax.Array,
    candidate_mask: jax.Array,
    top_k: int = 5,
    interpret: bool = False,
) -> jax.Array:
    """Labels-only predict with the whole segmentation head in one Pallas
    kernel (ops/pallas/head_topk.py) — the [B, H, W, D] embedding field is
    never materialized in HBM.  Exactly the same top-k labels as
    ``DepthUNet.predict`` modulo matmul precision (bit-equal in fp32,
    tests/test_pallas_kernels.py::test_fused_head_matches_predict).

    OPT-IN: benchmarked slower than the default predict at the canonical
    config (1900 vs 2016 maps/s on v5e — see head_topk.py's docstring for
    why); not dispatched by default.

    The output-conv weights are read straight from ``variables`` (the head
    conv is bias-free with no norm/activation, blocks.py Conv2d with
    ``activation=None``), so this is a plain function over the same
    (variables, inputs) predict consumes — TPU-only, inference-only.

    Returns topk indices [B, H, W, k] int32 in the global label space.
    """
    from rangeclip_tpu.ops.pallas.head_topk import fused_head_score_topk

    if depth.ndim == 3:
        depth = depth[..., None]
    target_shape = depth.shape[1:3]
    features = model.apply(
        variables, depth, method=DepthUNet.decode_features
    )
    head_kernel = variables["params"]["depth_decoder"]["output_conv"]["conv"][
        "kernel"
    ]
    text = l2_normalize(candidate_text_embeddings.astype(jnp.float32), axis=-1)
    B, h, w, _ = features.shape
    idx, _ = fused_head_score_topk(
        features, head_kernel, text, candidate_mask, top_k=top_k,
        interpret=interpret,
    )
    topk_indices = idx.reshape(B, h, w, top_k)
    if (h, w) != target_shape:
        topk_indices = resize_nearest(topk_indices, target_shape)
    return topk_indices


def predict_folded(
    model: DepthUNet,
    variables,
    depth: jax.Array,
    candidate_text_embeddings: jax.Array,
    candidate_mask: Optional[jax.Array] = None,
    top_k: int = 5,
    candidate_indices: Optional[jax.Array] = None,
    candidate_ids: Optional[jax.Array] = None,
    want_values: bool = False,
    upsample: bool = True,
    interpret: bool = False,
    max_candidate_id: Optional[int] = None,
) -> jax.Array:
    """Labels-only predict with the output conv FOLDED into the scoring.

    The segmentation head is ``topk_c(normalize(conv3x3(x, W)) . t_c)``
    (reference decoder.py:75-82 + model.py:161-169).  Two algebraic facts
    make the [B, h, w, D] embedding field unnecessary when only labels are
    wanted:

      * the conv is bias-free and linear, so the pixel-candidate score
        distributes over it:  conv(x, W) . t_c == conv(x, W @ t_c) — one
        offline contraction ``W' = einsum('hwid,sd->hwis', W, T_norm)``
        turns the conv-to-D plus the [D, S] scoring matmul into a single
        conv straight to the S candidate scores;
      * the per-pixel L2 normalization divides every candidate's score by
        the same positive scalar, so it cannot change the top-k ORDER —
        for labels it is skipped outright.

    Versus the default predict path this removes the [B, h, w, 512] bf16
    field (2.1 GB at the bench config) from HBM entirely and cuts the
    head's matmul FLOPs ~3x (9*Cin*S vs 9*Cin*D + D*S per pixel); the
    conv runs in XLA at full K=9*Cin im2col MXU occupancy — precisely
    what the all-Pallas fused head (head_topk.py, kept as the measured
    negative result) could not reach with its nine K=Cin matmuls.

    Exactness: identical ranking in exact arithmetic (proved bit-equal
    under float64 in tests); in finite precision the two paths round
    differently, so labels may differ on near-ties — in bf16 the folded
    path is the BETTER-conditioned one (a single bf16 rounding of W'
    against the default path's bf16 roundings of both the 512-dim field
    and the text table).

    Args beyond `predict`'s: ``candidate_ids`` says the table rows ARE the
    candidate set already — [S] ascending global class ids, -1 for dead
    rows (the class-sharded path, parallel/predict.py, passes each
    device's table slice this way).  ``want_values`` also returns the
    winning scores (f32, un-normalized — comparable across class shards
    but NOT to `predict`'s normalized logits).  ``upsample=False`` skips
    the final nearest-upsample and returns native-resolution indices.

    Returns topk indices [B, H, W, k] i32 in the global label space
    (native [B, h, w, k] when ``upsample=False``); with ``want_values``,
    an ``(indices, values)`` tuple.

    When to fold (measured, v5e, batch 128 @ 256^2): the folded conv
    materializes an [N, S] score field where the default path
    materializes an [N, D] embedding field (its scoring stays in
    registers inside pixel_text_topk), so folding trades head FLOPs
    against HBM bytes as S grows past D.  S=384: folded wins 27.4 vs
    30.3 ms; S=2048: folded LOSES 79 vs 65 ms (the 4x score field is
    ~17 GB of round-trip traffic).  :func:`folded_is_profitable` encodes
    the ~1.5*D crossover; the CLIs' ``--predict_path auto`` uses it.
    """
    from rangeclip_tpu.ops.pallas.conv_score_topk import (
        fused_conv_score_topk,
        fused_conv_topk_applicable,
    )
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    if depth.ndim == 3:
        depth = depth[..., None]
    target_shape = depth.shape[1:3]
    features = model.apply(variables, depth, method=DepthUNet.decode_features)
    B, h, w, _ = features.shape
    W = variables["params"]["depth_decoder"]["output_conv"]["conv"]["kernel"]

    # static id bound for the packed bf16 selector (score_topk.py):
    # caller-supplied global ids need a caller-supplied bound
    # (``max_candidate_id``, e.g. the class-sharded path's global class
    # count - 1); table-indexed forms are bounded by the table itself
    if candidate_ids is not None:
        table = candidate_text_embeddings
        ids = candidate_ids.astype(jnp.int32)
        id_bound = max_candidate_id
    elif candidate_indices is not None:
        table = candidate_text_embeddings[jnp.maximum(candidate_indices, 0)]
        ids = candidate_indices.astype(jnp.int32)
        id_bound = candidate_text_embeddings.shape[0] - 1
    else:
        table = candidate_text_embeddings
        C = table.shape[0]
        ids = jnp.arange(C, dtype=jnp.int32)
        if candidate_mask is not None:
            ids = jnp.where(candidate_mask, ids, -1)
        id_bound = C - 1
    if (use_tpu_kernels() or interpret) and table.shape[0] % 128:
        # round the slot count up to a lane multiple for the kernel; the
        # pad rows are id -1 (masked in-kernel) so they never win
        pad = 128 - table.shape[0] % 128
        table = jnp.pad(table, ((0, pad), (0, 0)))
        ids = jnp.pad(ids, (0, pad), constant_values=-1)
    text = l2_normalize(table.astype(jnp.float32), axis=-1)
    folded = jnp.einsum(
        "hwid,sd->hwis", W.astype(jnp.float32), text,
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)

    # bf16 TPU fast path (round 5): conv + selection fused in ONE Pallas
    # kernel — the [N, S] score field never round-trips HBM (1.6 GB
    # write + 1.6 GB read at the bench config) and the class-major MXU
    # scores feed selection with no in-register transpose.  Measured
    # 7.22 -> 5.50 ms for the pair at the bench scale, checksum-identical
    # (ops/pallas/conv_score_topk.py).  fp32 (parity mode) and
    # non-128-multiple batches keep the two-program formulation below.
    use_fused_conv = (
        (use_tpu_kernels() or interpret)
        and features.dtype == jnp.bfloat16
        and fused_conv_topk_applicable(features.shape, folded.shape[-1],
                                       id_bound)
    )
    if use_fused_conv:
        idx, val = fused_conv_score_topk(
            features, folded, ids, top_k=top_k, want_values=want_values,
            interpret=interpret,
        )
        topk_indices = idx.T.reshape(h, w, B, top_k).transpose(2, 0, 1, 3)
        if want_values:
            topk_values = val.T.reshape(h, w, B, top_k).transpose(
                2, 0, 1, 3)
    elif use_tpu_kernels() or interpret:
        scores = jax.lax.conv_general_dilated(
            features, folded, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Free logical transpose of the conv's {3,0,2,1} output layout —
        # same trick as the default predict path.
        field_t = jnp.transpose(scores, (1, 2, 0, 3))
        idx, val = fused_score_topk(field_t, ids, top_k=top_k,
                                    want_values=want_values,
                                    interpret=interpret,
                                    max_id=id_bound)
        topk_indices = idx.reshape(h, w, B, top_k).transpose(2, 0, 1, 3)
        if want_values:
            topk_values = val.reshape(h, w, B, top_k).transpose(2, 0, 1, 3)
    else:
        scores = jax.lax.conv_general_dilated(
            features, folded, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        masked = jnp.where(ids >= 0, scores.astype(jnp.float32), NEG_INF)
        topk_values, slot = jax.lax.top_k(masked, top_k)
        topk_indices = jnp.take(ids, slot, axis=0)
        # exhausted candidate set -> -1 sentinel (see DepthUNet.predict)
        topk_indices = jnp.where(topk_values > -1e29, topk_indices, -1)

    if upsample and (h, w) != target_shape:
        topk_indices = resize_nearest(topk_indices, target_shape)
        if want_values:
            topk_values = resize_nearest(topk_values, target_shape)
    if want_values:
        return topk_indices, topk_values
    return topk_indices


def folded_is_profitable(num_slots: int, embedding_dim: int = 512,
                         fused_ok: bool = False) -> bool:
    """Should `predict_folded` be used over `predict` for this candidate
    count?  Folding removes the conv-to-D + scoring matmul (wins FLOPs at
    any S) but materializes an [N, S] score field where the default path
    materializes [N, D] (in-register scoring) — HBM traffic grows with S.
    Measured crossover on v5e is around S ~ 1.5*D (S=384 wins ~10%,
    S=2048 loses ~18%; see predict_folded's docstring).

    ``fused_ok``: the caller has checked
    :func:`rangeclip_tpu.ops.pallas.conv_score_topk.fused_conv_topk_applicable`
    for its batch shape.  The fused conv+select kernel never materializes
    the [N, S] score field, so the crossover disappears — folding wins at
    EVERY S (measured at the far end, C=2048 full-table batch 128: fused
    folded 37.5 ms vs unfolded 60.9 ms in one process, round 5)."""
    if fused_ok:
        return True
    padded = -(-num_slots // 128) * 128
    return padded <= (3 * embedding_dim) // 2


def fused_head_ok(batch: int, num_slots: int) -> bool:
    """Convenience pre-check for ``folded_is_profitable(..., fused_ok=)``
    at dispatch sites that know only (batch, candidate count): the
    batch-multiple and id-bound conditions of ``fused_conv_topk_
    applicable``.  The remaining conditions (C_in % 8, S % 128 after
    padding) are re-checked against REAL shapes inside ``predict_folded``,
    which silently falls back to the two-program path — so a True here
    can never select a broken path, only (in exotic configs) a slightly
    suboptimal one."""
    padded = -(-num_slots // 128) * 128
    return batch % 128 == 0 and padded - 1 < 2 ** 16 and use_tpu_kernels()


def build_candidate_mask(
    key: jax.Array,
    segmentation: jax.Array,
    num_classes: int,
    num_negatives: int,
) -> jax.Array:
    """Reduced candidate set as a static boolean mask over all C classes.

    Reference semantics (model.py:147-156): candidates = unique labels in the
    ground-truth segmentation plus ``num_negatives`` labels sampled uniformly
    without replacement from the complement.  Sampling without replacement is
    done with the Gumbel-top-k trick over masked scores; when the complement
    is smaller than ``num_negatives`` every non-GT class is included (the
    reference's ``min(num_negatives, len(pool))``).

    Args:
      key: PRNG key.
      segmentation: [B, H, W] (or any shape) int labels.
      num_classes: C, static.
      num_negatives: static int.

    Returns: [C] bool mask.
    """
    flat = segmentation.reshape(-1)
    if use_tpu_kernels():
        # The boolean scatter lowers to a serialized per-element path on
        # TPU (~4 ms / 180k labels, class_presence.py) and this runs
        # inside every jitted val/baseline step over B*H*W labels — the
        # MXU one-hot presence kernel computes the same [C] vector ~40x
        # faster (the loss layer's existing dispatch pattern).
        from rangeclip_tpu.ops.pallas.class_presence import (
            fused_class_presence,
        )

        gt_mask = fused_class_presence(
            flat, jnp.ones(flat.shape, jnp.float32), num_classes
        )
    else:
        gt_mask = jnp.zeros((num_classes,), jnp.bool_).at[flat].set(True)

    gumbel = jax.random.gumbel(key, (num_classes,))
    scores = jnp.where(gt_mask, -jnp.inf, gumbel)
    k = min(num_negatives, num_classes)
    # Keep only finite-score picks (i.e. genuine non-GT classes).
    picked_scores, neg_idx = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(picked_scores)
    neg_mask = jnp.zeros((num_classes,), jnp.bool_).at[neg_idx].max(valid)
    return gt_mask | neg_mask


def candidate_indices_from_mask(
    candidate_mask: jax.Array, capacity: int
) -> jax.Array:
    """[C] bool mask -> [capacity] int32 candidate ids, ascending, -1 pad.

    The ascending order makes min-index tie-breaking over the gathered
    table identical to tie-breaking over the masked full table, so
    ``predict(candidate_indices=...)`` is bit-identical to
    ``predict(candidate_mask=...)`` whenever the mask's population fits in
    ``capacity`` (classes beyond the capacity are silently dropped —
    size it as |unique GT| upper bound + num_negatives, rounded up to a
    multiple of 128 for MXU-friendly scoring shapes).
    """
    C = candidate_mask.shape[0]
    # score True entries by descending class id -> top_k returns the True
    # class ids in ascending order, padded with score-0 (invalid) picks
    score = jnp.where(candidate_mask, C - jnp.arange(C, dtype=jnp.int32), 0)
    val, idx = jax.lax.top_k(score, min(capacity, C))
    idx = jnp.where(val > 0, idx, -1)
    if capacity > C:
        idx = jnp.pad(idx, (0, capacity - C), constant_values=-1)
    return idx


def build_candidate_indices(
    key: jax.Array,
    segmentation: jax.Array,
    num_classes: int,
    num_negatives: int,
    capacity: int,
) -> jax.Array:
    """Reduced candidate set as a fixed-capacity gathered index list.

    Same draw as :func:`build_candidate_mask` (identical key stream), in
    the form the reference actually uses — an index list into the text
    table (model.py:147-161) — emitted ascending and -1-padded to the
    static ``capacity``.  Feed to ``DepthUNet.predict(candidate_indices=)``
    to score S=capacity slots instead of all C classes.
    """
    mask = build_candidate_mask(key, segmentation, num_classes, num_negatives)
    return candidate_indices_from_mask(mask, capacity)
