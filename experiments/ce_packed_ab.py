"""A/B: FULL train step with the packed-contrast CE vs the full-C kernel.

The contrast set at the canonical config is present-labels + 50
distractors (~90 live classes) but the full-C fused CE scores all 512
columns — MXU and VPU work scale with C, so packing the members into a
gathered [K=128, D] table (global ids compared in-kernel, lax.cond
full-C fallback on overflow) should cut the CE pair's ~14.5 ms of the
52.6 ms device step by ~4x.  Times the REAL 1x32 @ 256^2 bf16 train
step with HybridLossConfig.contrast_capacity toggled, interleaved
rounds in ONE process.

Run on the TPU machine:  python experiments/ce_packed_ab.py
(AB_C=2048 sweeps the NYUv2-scale label table, where the full-C CE cost
scales 4x but the packed form stays at K=128.)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rangeclip_tpu.losses.hybrid import HybridLossConfig
from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
from rangeclip_tpu.training.optim import make_optimizer
from rangeclip_tpu.training.state import create_train_state
from rangeclip_tpu.training.train_step import make_train_step

A, B, RES, D = 1, 32, 256, 512
C = int(os.environ.get("AB_C", 512))
ROUNDS, ITERS = 6, 8


def build_step(variant):
    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)
    opt = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(0), cfg, opt, (B, RES, RES, 1))
    loss_cfg = HybridLossConfig(
        contrast_capacity=128 if variant == "packed" else None)
    step = make_train_step(model, opt, loss_cfg, accum_steps=A)

    rngnp = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, {
        "depth": rngnp.standard_normal((A, B, RES, RES, 1)).astype(np.float32),
        "segmentation": rngnp.integers(0, 40, (A, B, RES, RES)).astype(np.int32),
        "object_label": np.ones((A, B), np.int32),
        "image_embeddings": rngnp.standard_normal((A, B, D)).astype(np.float32),
        "sample_valid": np.ones((A, B), np.float32),
    })
    text = jax.random.normal(jax.random.key(1), (C, D))
    med = jnp.zeros((C, C), bool)

    def run(s):
        return step(s, batch, jax.random.key(5), jnp.float32(1e-4),
                    jnp.float32(0.25), jnp.float32(0.5), text, med, med)

    sstate, info = run(jax.tree.map(jnp.copy, state))
    jax.block_until_ready(sstate)
    return run, sstate, info


def main():
    holders, best, losses = {}, {}, {}
    for name in ("full", "packed"):
        print(f"# building {name} step ...", flush=True)
        run, s, info = build_step(name)
        holders[name] = (run, s)
        best[name] = float("inf")
        losses[name] = float(info["total_loss"])
    print("# step-1 loss: " + ", ".join(
        f"{k} {v:.6f}" for k, v in losses.items())
        + " (K-lane vs C-lane f32 reduction order differences expected)")
    for v in losses.values():
        assert abs(v - losses["full"]) / abs(losses["full"]) < 1e-2

    for r in range(ROUNDS):
        for name in holders:
            run, s = holders[name]
            t0 = time.perf_counter()
            for _ in range(ITERS):
                s, info = run(s)
            jax.block_until_ready(s)
            holders[name] = (run, s)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / ITERS)
        print(f"# round {r}: " + ", ".join(
            f"{k} {v * 1e3:.2f} ms/step" for k, v in best.items()), flush=True)
    ratio = best["full"] / best["packed"]
    print(f"VERDICT: packed-contrast step is {ratio:.3f}x the full-C step "
          f"({best['full']*1e3:.2f} -> {best['packed']*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
