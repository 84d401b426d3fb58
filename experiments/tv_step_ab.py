"""A/B: FULL train step with the row-tile TV kernel vs the XLA TV VJP.

experiments/tv_rowtile_ab.py measures the isolated loss fwd+bwd
(13.24 -> 8.03 ms, 1.65x); this times the REAL 1x32 @ 256^2 bf16 train
step with the smoothness dispatch toggled via a trace-time monkeypatch
of tv_rowtile.kernel_applicable, interleaved rounds in ONE process —
the number that decides whether the kernel stays the default.

Run on the TPU machine:  python experiments/tv_step_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import rangeclip_tpu.ops.pallas.tv_rowtile as tvk_mod
from rangeclip_tpu.losses.hybrid import HybridLossConfig
from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
from rangeclip_tpu.training.optim import make_optimizer
from rangeclip_tpu.training.state import create_train_state
from rangeclip_tpu.training.train_step import make_train_step

A, B, RES, C, D = 1, 32, 256, 512, 512
ROUNDS, ITERS = 6, 8


def build_step(variant):
    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)
    opt = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(0), cfg, opt, (B, RES, RES, 1))
    step = make_train_step(model, opt, HybridLossConfig(), accum_steps=A)

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

    orig_gate = tvk_mod.kernel_applicable
    if variant == "xla":
        tvk_mod.kernel_applicable = lambda shape, dtype: False
    try:
        def run(s):
            return step(s, batch, jax.random.key(5), jnp.float32(1e-4),
                        jnp.float32(0.25), jnp.float32(0.5), text, med, med)

        sstate, info = run(jax.tree.map(jnp.copy, state))
        jax.block_until_ready(sstate)
    finally:
        tvk_mod.kernel_applicable = orig_gate
    return run, sstate, info


def main():
    holders, best, losses = {}, {}, {}
    for name in ("xla", "kernel"):
        print(f"# building {name} step ...", flush=True)
        run, s, info = build_step(name)
        holders[name] = (run, s)
        best[name] = float("inf")
        losses[name] = float(info["total_loss"])
    print("# step-1 loss: " + ", ".join(
        f"{k} {v:.6f}" for k, v in losses.items())
        + " (bf16 reduce-order differences expected)")
    for v in losses.values():
        assert abs(v - losses["xla"]) / abs(losses["xla"]) < 1e-2

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
    ratio = best["xla"] / best["kernel"]
    print(f"VERDICT: row-tile-TV step is {ratio:.3f}x the XLA-TV step "
          f"({best['xla']*1e3:.2f} -> {best['kernel']*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
