"""The compiled training step: gradient accumulation + Adam update, one XLA
program.

Reference hot loop: train_util.py:279-345 — per microbatch forward (AMP),
area-embedding preparation, hybrid loss, backward with loss/accum_steps;
every ``accumulation_steps`` (=8) microbatches one optimizer step.

TPU-native design:
  * the whole accumulation window is ONE jitted step — a ``lax.scan`` over
    the microbatch axis runs 8 forward/backward passes on-device and sums
    gradients, then a single Adam update fires.  No host round-trips, no
    GradScaler (bf16 needs none), no per-microbatch dispatch overhead;
  * BatchNorm statistics update through the scan carry, replicating the
    reference's 8 BN updates per optimizer step;
  * the learning rate and curriculum percentages are traced scalars —
    epoch-level schedule changes never recompile;
  * under a ``jax.sharding.Mesh`` the same step runs data-parallel: the
    trainer shards the batch over the 'data' axis and XLA inserts the psum
    for gradients (DDP-allreduce equivalent); a 'model' axis can shard the
    class dimension of the text table, with the softmax logsumexp
    reduction becoming an ICI all-reduce automatically.

BatchNorm under the mesh — precise semantics: this step is jitted over the
whole mesh WITHOUT an axis name, so BN's batch statistics are ordinary
``jnp.mean`` reductions over the full (global) batch axis; XLA lowers them
to ICI all-reduces over the 'data'-sharded dimension.  That is exactly
sync-BN over the global batch — NOT the reference's per-replica DDP BN
(each torch rank normalizes with its local microbatch statistics).  The
global-batch variant is the TPU-idiomatic choice (deterministic, no
per-replica stat drift) but it is a documented semantic difference: a
reference-exact multi-device parity run would need per-replica stats via
``shard_map`` with ``bn_axis_name`` plumbed to a sub-axis, which no config
currently enables.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rangeclip_tpu.losses.hybrid import (
    HybridLossConfig,
    compute_hybrid_loss,
    pixel_sampling_key,
)
from rangeclip_tpu.losses.infonce import (
    sample_pixel_multiplicities_multinomial,
)
from rangeclip_tpu.losses.pooling import per_item_masked_pooling
from rangeclip_tpu.models.depth_unet import DepthUNet
from rangeclip_tpu.training.state import TrainState


def make_train_step(
    model: DepthUNet,
    optimizer: optax.GradientTransformation,
    loss_config: HybridLossConfig = HybridLossConfig(),
    accum_steps: int = 8,
    donate: bool = True,
    native_losses: bool = True,
    hoist_sampling: bool = True,
) -> Callable:
    """Build the jitted train step.

    The returned function has signature
      step(state, batch, rng, lr, pct_medium, pct_hard,
           text_table, medium_matrix, hard_matrix) -> (state, loss_info)

    ``batch`` is a dict with a leading accumulation axis A == accum_steps:
      depth          [A, B, H, W, 1] float32
      segmentation   [A, B, H, W]    int32
      object_label   [A, B]          int32
      image_embeddings [A, B, D]     float32 (frozen CLIP crop embeddings;
                                     zeros when the image loss is disabled)
      sample_valid   [A, B]          float32

    ``native_losses=True`` (default) evaluates every loss term at the
    decoder's NATIVE resolution (H/2): the full-res field is a nearest x2
    upsample, and CE / TV / area pooling all commute with that upsample
    exactly (hybrid.py label_upsample) — identical losses and gradients
    with ~4x less HBM traffic (the train step is bandwidth-bound).
    ``native_losses=False`` is the literal full-resolution formulation for
    parity runs.
    """
    use_image_loss = loss_config.w_image > 0

    # Hoisting applies to the multinomial sampler only (the histogram
    # scatter has no grad path to trip on, and the gather sampler needs
    # the forward's field); ``hoist_sampling=False`` keeps the sampler
    # inline for the bit-identity test.
    hoist_multinomial = (hoist_sampling
                         and loss_config.pixel_sampler == "multinomial")

    def microbatch_loss(params, batch_stats, mb, rng, pct_m, pct_h,
                        text_table, medium_matrix, hard_matrix):
        fwd = DepthUNet.forward_native if native_losses else None
        (pixel_emb, temp_t, temp_i), updated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb["depth"],
            train=True,
            mutable=["batch_stats"],
            **({"method": fwd} if fwd else {}),
        )
        H = mb["depth"].shape[1]
        ups = H // pixel_emb.shape[1]
        assert H == ups * pixel_emb.shape[1], (H, pixel_emb.shape)
        area_emb = image_emb = None
        if use_image_loss:
            # Area embeddings come from the differentiable pixel field
            # (dataloader.py:287-304); CLIP crop embeddings are precomputed
            # and constant (stop_gradient is implicit — they are inputs).
            area_emb = per_item_masked_pooling(
                pixel_emb, mb["segmentation"], mb["object_label"],
                upsample=ups,
            )
            image_emb = mb["image_embeddings"]
        total, info = compute_hybrid_loss(
            rng,
            pixel_emb,
            mb["segmentation"],
            text_table,
            medium_matrix,
            hard_matrix,
            temperature_text=temp_t,
            temperature_image=temp_i,
            pct_medium=pct_m,
            pct_hard=pct_h,
            area_embeddings=area_emb,
            image_embeddings=image_emb,
            area_valid=mb["sample_valid"] if use_image_loss else None,
            sample_weight=mb.get("sample_valid"),
            config=loss_config,
            label_upsample=ups,
            precomputed_pixels=(
                (mb["_pixel_weights"], mb["_pixel_labels"])
                if "_pixel_weights" in mb else None
            ),
        )
        return total, (info, updated["batch_stats"])

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        lr: jax.Array,
        pct_medium: jax.Array,
        pct_hard: jax.Array,
        text_table: jax.Array,
        medium_matrix: jax.Array,
        hard_matrix: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)

        if hoist_multinomial and loss_config.w_text > 0:
            # Hoist the multinomial pixel sampler out of the grad'd scan
            # body; the key derivation matches the in-loss sampler exactly
            # (pixel_sampling_key), so hoisted and inline sampling are
            # bit-identical (tested).  NOTE measured outcome: the hoist
            # does NOT rescue the sampler — binomial's while_loops cost
            # ~350 ms merely by being in the same XLA program as the train
            # step (668 vs 320 ms/step; 0.18 ms standalone; a histogram
            # control through this same path is free).  The histogram
            # default remains the fast path; see HybridLossConfig.
            H = batch["depth"].shape[2]
            if native_losses:
                field = jax.eval_shape(
                    lambda p, bs, d: model.apply(
                        {"params": p, "batch_stats": bs}, d, train=True,
                        mutable=["batch_stats"],
                        method=DepthUNet.forward_native,
                    )[0][0],
                    state.params, state.batch_stats, batch["depth"][0],
                )
                hoist_ups = H // field.shape[1]
            else:
                hoist_ups = 1

            def sample_mb(idx):
                mb_rng = jax.random.fold_in(rng, idx)
                return sample_pixel_multiplicities_multinomial(
                    pixel_sampling_key(mb_rng),
                    batch["segmentation"][idx],
                    loss_config.percent_image_sampling,
                    slots=hoist_ups,
                )

            # unrolled, NOT lax.map: lax.map is a scan, and binomial's
            # while_loops are pathological inside any scan (measured 667 ms
            # vs 320 ms/step via lax.map; unrolled ~3 ms total)
            per_mb = [sample_mb(i) for i in range(accum_steps)]
            pw = jnp.stack([w for w, _ in per_mb])
            pl = jnp.stack([l for _, l in per_mb])
            batch = dict(batch, _pixel_weights=pw, _pixel_labels=pl)

        def scan_body(carry, mb_with_idx):
            grads_acc, batch_stats, info_acc = carry
            mb, idx = mb_with_idx
            mb_rng = jax.random.fold_in(rng, idx)
            (loss, (info, new_stats)), grads = grad_fn(
                state.params, batch_stats, mb, mb_rng, pct_medium, pct_hard,
                text_table, medium_matrix, hard_matrix,
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            info_acc = jax.tree.map(jnp.add, info_acc, info)
            return (grads_acc, new_stats, info_acc), None

        zero_info = {
            "total_loss": jnp.float32(0.0),
            "text_contrastive_loss": jnp.float32(0.0),
            "image_contrastive_loss": jnp.float32(0.0),
            "smoothness_loss": jnp.float32(0.0),
            "temperature_text": jnp.float32(0.0),
            "temperature_image": jnp.float32(0.0),
            "W_text": jnp.float32(0.0),
            "W_image": jnp.float32(0.0),
            "W_smooth": jnp.float32(0.0),
        }
        idxs = jnp.arange(accum_steps)
        (grads, batch_stats, info_sum), _ = jax.lax.scan(
            scan_body, (zero_grads, state.batch_stats, zero_info), (batch, idxs)
        )
        # Mean gradient over microbatches == reference's sum of loss/accum
        # gradients (train_util.py:337-338).
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        info = jax.tree.map(lambda x: x / accum_steps, info_sum)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        info["learning_rate"] = jnp.asarray(lr, jnp.float32)
        info["grad_norm"] = optax.global_norm(grads)
        return new_state, info

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
