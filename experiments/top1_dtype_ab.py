#!/usr/bin/env python
"""Controlled bf16-vs-fp32 A/B for the top-1 ceiling (VERDICT r4 #2).

The round-4 canonical convergence run learned decisively on top-5
metrics but its top-1 pixel accuracy saturated 2.5 points above the
majority (floor-plane) baseline.  Hypothesis chain, tested here:

  1. INPUT quantization: casting the median-normalized depth to bf16
     merges adjacent depth planes (measured: a nearest-plane classifier
     drops 0.999 -> 0.884 top-1 at the r4 config's C=256 spacing —
     real, but far above the observed 0.576 ceiling).
  2. COMPUTE precision: adjacent-plane separation (~1-2 bf16 ulps of
     normalized depth) must survive ~20 bf16 layers; per-layer rounding
     compounds, so neighbor ranking (top-1) fails while coarse ranking
     (top-5) succeeds.

Design: two identical trainings through the real CLI on one on-disk
synthetic dataset (112^2, C=128 -> plane spacing 1-3 bf16 ulps after
normalization, squarely in the confusable regime), differing ONLY in
--bf16.  If fp32 resolves top-1 where bf16 stalls, precision is the
ceiling — the diagnosis the canonical round-5 run then acts on.

Usage (TPU machine):  python experiments/top1_dtype_ab.py [workdir]
"""

import os
import re
import subprocess
import sys

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/top1_ab"
os.makedirs(WORK, exist_ok=True)

from rangeclip_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402

paths = write_synthetic_dataset(
    os.path.join(WORK, "data"), n_samples=300, shape=(112, 112),
    num_classes=128, seed=11, n_regions=10,
)
print(paths, flush=True)

COMMON = [
    sys.executable, "-m", "rangeclip_tpu.cli.train",
    "--labeled_metadata_path", paths["metadata"],
    "--labels_path", paths["labels"],
    "--equivalence_dict_path", paths["similarity"],
    "--unet_architecture", "resnet",
    "--batch_size", "8", "--n_height", "112", "--n_width", "112",
    "--accumulation_steps", "2",
    "--learning_rates", "2e-4", "2e-5",
    "--learning_schedule", "52", "60",
    "--scheduler_type", "multi_step",
    "--w_weight_decay", "0.0",
    "--w_text", "1.0", "--w_image", "0.5", "--w_smooth", "2e2",
    "--contrast_capacity", "128",
    "--clip_checkpoint_path", "random",
    "--embedding_dim", "512",
    "--n_step_per_checkpoint", "400",
    "--n_step_per_summary", "30",
    "--n_step_per_validation", "120",
    "--validation_start_step", "120",
    "--max_steps", "700",
    "--seed", "0",
]

results = {}
for arm in ("bf16", "fp32"):
    ckpt = os.path.join(WORK, f"ckpt_{arm}")
    cmd = COMMON + ["--checkpoint_path", ckpt]
    if arm == "bf16":
        cmd.append("--bf16")
    log = os.path.join(WORK, f"train_{arm}.log")
    print(f"# training {arm} ...", flush=True)
    with open(log, "w") as f:
        subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, check=True)
    txt = open(log).read()
    # pull the per-validation metric lines the trainer prints
    vals = re.findall(
        r"Step (\d+) \| .*?pixel_accuracy_t1[\"']?[:=] ?([0-9.]+).*?"
        r"pixel_accuracy_tk[\"']?[:=] ?([0-9.]+)", txt)
    best = re.search(r"Best results: (\{.*\})", txt)
    results[arm] = best.group(1) if best else "NO RESULT"
    print(f"# {arm} best: {results[arm]}", flush=True)

print("\n== A/B summary ==")
for arm, r in results.items():
    print(arm, r)
