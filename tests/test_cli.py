"""CLI surface smoke tests: train -> validate -> infer -> benchmark
robustness, chained through the argv entry points the way a user runs them."""

import glob
import os

import numpy as np
import pytest

from rangeclip_tpu.data.synthetic import write_synthetic_dataset

RES = 32
EDIM = 32


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = write_synthetic_dataset(
        str(root / "data"), n_samples=12, shape=(RES, RES), num_classes=8
    )
    return {"root": root, **data}


def _data_flags(ws):
    return [
        "--labeled_metadata_path", ws["metadata"],
        "--labels_path", ws["labels"],
        "--equivalence_dict_path", ws["similarity"],
    ]


@pytest.mark.slow
def test_cli_train_then_validate_then_infer(workspace):
    from rangeclip_tpu.cli import benchmark as bench_cli
    from rangeclip_tpu.cli import infer as infer_cli
    from rangeclip_tpu.cli import train as train_cli
    from rangeclip_tpu.cli import validate as validate_cli

    ws = workspace
    ckpt = str(ws["root"] / "ckpt")
    import rangeclip_tpu.training.trainer as trainer_mod
    from rangeclip_tpu.models.depth_unet import DepthUNetConfig

    orig = DepthUNetConfig

    def small_cfg(**kw):
        kw["encoder_filters"] = (8, 16, 16, 16, 32)
        return orig(**kw)

    trainer_mod.DepthUNetConfig = small_cfg
    try:
        train_cli.main(_data_flags(ws) + [
            "--checkpoint_path", ckpt, "--unet_architecture", "resnet",
            "--batch_size", "2", "--n_height", str(RES), "--n_width", str(RES),
            "--learning_rates", "1e-3", "--learning_schedule", "1",
            "--accumulation_steps", "2", "--embedding_dim", str(EDIM),
            "--n_step_per_summary", "2", "--n_step_per_checkpoint", "2",
            "--validation_start_step", "2", "--max_steps", "2",
        ])
    finally:
        trainer_mod.DepthUNetConfig = orig

    ckpt_dir = os.path.join(ckpt, "checkpoints")
    assert os.path.isdir(ckpt_dir)
    assert os.path.exists(os.path.join(ckpt, "results.txt"))

    # validate CLI restores the checkpoint and reruns metrics; the small
    # encoder patch must match what training used
    from rangeclip_tpu.models import depth_unet as du_mod

    du_orig = du_mod.DepthUNetConfig
    du_mod.DepthUNetConfig = small_cfg
    try:
        validate_cli.main(_data_flags(ws) + [
            "--checkpoint_dir", ckpt_dir, "--batch_size", "2",
            "--n_height", str(RES), "--n_width", str(RES),
            "--embedding_dim", str(EDIM),
        ])
    finally:
        du_mod.DepthUNetConfig = du_orig

    # infer CLI streams depth PNGs through the checkpointed model
    out_dir = str(ws["root"] / "out")
    depth_glob = os.path.join(os.path.dirname(ws["metadata"]), "depth_*.png")
    du_mod.DepthUNetConfig = small_cfg
    try:
        infer_cli.main([
            "--checkpoint_dir", ckpt_dir, "--depth_glob", depth_glob,
            "--labels_path", ws["labels"], "--output_dir", out_dir,
            "--batch_size", "4", "--height", str(RES), "--width", str(RES),
            "--embedding_dim", str(EDIM),
        ])
    finally:
        du_mod.DepthUNetConfig = du_orig

    labels_out = glob.glob(os.path.join(out_dir, "*_labels.png"))
    topk_out = glob.glob(os.path.join(out_dir, "*_topk.npy"))
    assert len(labels_out) == 12 and len(topk_out) == 12
    topk = np.load(topk_out[0])
    assert topk.shape == (RES, RES, 5)

    # a corrupt input must fail the CLI (producer error propagates through
    # the pipeline threads) rather than hanging the queue handoff
    bad_dir = ws["root"] / "bad"
    bad_dir.mkdir()
    (bad_dir / "depth_bad.png").write_bytes(b"not a png")
    du_mod.DepthUNetConfig = small_cfg
    try:
        with pytest.raises(Exception):
            infer_cli.main([
                "--checkpoint_dir", ckpt_dir,
                "--depth_glob", str(bad_dir / "depth_*.png"),
                "--labels_path", ws["labels"],
                "--output_dir", str(ws["root"] / "out_bad"),
                "--batch_size", "4", "--height", str(RES),
                "--width", str(RES), "--embedding_dim", str(EDIM),
            ])
    finally:
        du_mod.DepthUNetConfig = du_orig

    # robustness benchmark over the trained checkpoint
    du_mod.DepthUNetConfig = small_cfg
    try:
        bench_cli.main(["robustness"] + _data_flags(ws) + [
            "--checkpoint_dir", ckpt_dir, "--batch_size", "2",
            "--n_height", str(RES), "--n_width", str(RES),
            "--embedding_dim", str(EDIM), "--brightness_levels", "1.0",
        ])
    finally:
        du_mod.DepthUNetConfig = du_orig


def test_cli_train_rejects_mismatched_schedule(workspace):
    from rangeclip_tpu.cli import train as train_cli

    with pytest.raises(AssertionError, match="learning rates and schedule"):
        train_cli.main(_data_flags(workspace) + [
            "--checkpoint_path", str(workspace["root"] / "x"),
            "--unet_architecture", "resnet",
            "--learning_rates", "1e-3", "1e-4", "--learning_schedule", "1",
        ])
