"""End-to-end smoke: synthetic on-disk dataset -> trainer (2 steps) ->
checkpoint -> restore -> validation metrics.  Exercises the full stack the
way the CLI does."""

import os

import numpy as np
import pytest
import jax

from rangeclip_tpu.data.synthetic import write_synthetic_dataset


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    from rangeclip_tpu.training.trainer import TrainerConfig, train_depth_clip_model

    data = write_synthetic_dataset(str(tmp_path / "data"), n_samples=12,
                                   shape=(32, 32), num_classes=8)

    cfg = TrainerConfig(
        labeled_metadata_path=data["metadata"],
        labels_path=data["labels"],
        equivalence_dict_path=data["similarity"],
        batch_size=2,
        n_height=32,
        n_width=32,
        unet_architecture="resnet",
        learning_rates=[1e-3],
        learning_schedule=[2],
        scheduler_type="multi_step",
        w_weight_decay=1e-4,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_step_per_checkpoint=1,
        n_step_per_summary=1,
        validation_start_step=1,
        accumulation_steps=2,
        embedding_dim=32,
        max_steps=2,
    )
    # shrink the model for CPU: patch the config the trainer builds
    import rangeclip_tpu.training.trainer as trainer_mod
    from rangeclip_tpu.models.depth_unet import DepthUNetConfig

    orig = DepthUNetConfig

    def small_cfg(**kw):
        kw["encoder_filters"] = (8, 16, 16, 16, 32)
        return orig(**kw)

    trainer_mod.DepthUNetConfig = small_cfg
    try:
        best = train_depth_clip_model(cfg)
    finally:
        trainer_mod.DepthUNetConfig = orig

    # validation ran and produced metrics
    assert best["step"] >= 1
    assert 0.0 <= best["mIoU_tk"] <= 1.0
    assert np.isfinite(best["loss"])

    # checkpoint written and restorable
    ckpt_dir = str(tmp_path / "ckpt" / "checkpoints")
    assert os.path.isdir(ckpt_dir)
    from rangeclip_tpu.training.checkpoint import CheckpointManager
    from rangeclip_tpu.training.optim import make_optimizer
    from rangeclip_tpu.training.state import create_train_state

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 2
    template = create_train_state(
        jax.random.key(0), small_cfg(embedding_dim=32, use_batch_norm=True),
        make_optimizer(1e-4), (2, 32, 32, 1),
    )
    restored = mgr.restore(template)
    assert int(restored.step) == 2

    # results log exists
    assert os.path.exists(str(tmp_path / "ckpt" / "results.txt"))


@pytest.mark.slow
def test_trainer_ddp_parity_smoke(tmp_path):
    """--ddp_parity wiring through the trainer: the shard_map train step
    builds against the trainer's own mesh and runs a real optimizer step
    (semantics proven in test_parallel; this covers the integration)."""
    from rangeclip_tpu.training.trainer import TrainerConfig, train_depth_clip_model

    data = write_synthetic_dataset(str(tmp_path / "data"), n_samples=8,
                                   shape=(32, 32), num_classes=8)
    cfg = TrainerConfig(
        labeled_metadata_path=data["metadata"],
        labels_path=data["labels"],
        equivalence_dict_path=data["similarity"],
        batch_size=2,
        n_height=32,
        n_width=32,
        learning_rates=[1e-3],
        learning_schedule=[1],
        checkpoint_path=str(tmp_path / "ckpt"),
        n_step_per_checkpoint=100,
        n_step_per_summary=100,
        validation_start_step=100,  # skip validation; train-step smoke only
        accumulation_steps=2,
        embedding_dim=32,
        max_steps=1,
        ddp_parity=True,
        encoder_filters=(8, 16, 16, 16, 32),
    )
    train_depth_clip_model(cfg)
    assert os.path.exists(str(tmp_path / "ckpt" / "results.txt"))
