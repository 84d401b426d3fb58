"""Can the frozen CLIP window tower's device time hide under the train
step?  (VERDICT r3 #4)

Hypothesis under test: "double-buffering" — dispatching window N+1's tower
call right after step N's dispatch, so the tower queues behind the step
instead of in front of it — should reduce the tower's marginal cost below
its isolated runtime IF any overlap between the two XLA programs exists.

Expected physics: a TPU core executes ONE XLA program at a time, so the
tower's device compute serializes with the step's regardless of dispatch
order; only HOST latency can hide, and the window tower already adds none
(its +3.7 ms/step marginal == its isolated device time, README).  This
script measures all three orders in ONE process (interleaved rounds,
best-of — tunnel variance):

  A  baseline      step only (no tower)
  B  tower-first   tower(N) dispatched before step(N)   [trainer today]
  C  prefetched    tower(N+1) dispatched right after step(N), consumed
                   next iteration — the double-buffer schedule

If C == B > A by the tower's isolated time, the negative is confirmed and
the trainer keeps its simple order.  Run on the TPU machine:
    python experiments/tower_overlap_ab.py [--iters 30] [--rounds 4]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--classes", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rangeclip_tpu.losses.hybrid import HybridLossConfig
    from rangeclip_tpu.models.clip.crops import prepare_image_crops
    from rangeclip_tpu.models.clip.model import CLIP_VIT_B32, CLIPVisionTower
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
    from rangeclip_tpu.training.optim import make_optimizer
    from rangeclip_tpu.training.state import create_train_state
    from rangeclip_tpu.training.train_step import make_train_step
    from rangeclip_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    A, B, res, C, D = args.accum, args.batch, args.res, args.classes, 512

    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)
    opt = make_optimizer(0.0)
    state0 = create_train_state(jax.random.key(0), cfg, opt, (B, res, res, 1))
    step = make_train_step(model, opt, HybridLossConfig(), accum_steps=A)

    tcfg = dc.replace(CLIP_VIT_B32, dtype=jnp.bfloat16)
    tower = CLIPVisionTower(tcfg)
    crop0 = jnp.zeros((A * B, 224, 224, 3), jnp.float32)
    tower_params = jax.jit(tower.init)(jax.random.key(9), crop0)

    rngnp = np.random.default_rng(0)
    images = jnp.asarray(rngnp.random((A * B, res, res, 3), np.float32))
    xy = rngnp.integers(0, res // 2, (A * B, 2))
    bboxes = jnp.asarray(np.concatenate(
        [xy, xy + rngnp.integers(16, res // 2, (A * B, 2))], axis=1
    ).astype(np.int32))

    @jax.jit
    def window_tower(tower_params, images, bboxes):
        crops = prepare_image_crops(images, bboxes)
        embs = tower.apply(tower_params, crops)
        return embs.reshape(A, B, -1).astype(jnp.float32)

    batch = {
        "depth": jnp.asarray(rngnp.standard_normal(
            (A, B, res, res, 1)).astype(np.float32)),
        "segmentation": jnp.asarray(rngnp.integers(
            0, 40, (A, B, res, res)).astype(np.int32)),
        "object_label": jnp.ones((A, B), jnp.int32),
        "image_embeddings": jnp.asarray(rngnp.standard_normal(
            (A, B, D)).astype(np.float32)),
        "sample_valid": jnp.ones((A, B), jnp.float32),
    }
    sargs = (jax.random.key(5), jnp.float32(1e-4), jnp.float32(0.25),
             jnp.float32(0.5),
             jnp.asarray(rngnp.standard_normal((C, D)).astype(np.float32)),
             jnp.zeros((C, C), jnp.bool_), jnp.zeros((C, C), jnp.bool_))

    def run_A(state, n):
        for _ in range(n):
            state, _ = step(state, batch, *sargs)
        jax.block_until_ready(state)
        return state

    def run_B(state, n):  # tower-first (trainer order)
        for _ in range(n):
            embs = window_tower(tower_params, images, bboxes)
            state, _ = step(state, dict(batch, image_embeddings=embs),
                            *sargs)
        jax.block_until_ready(state)
        return state

    def run_C(state, n):  # prefetched: tower(N+1) after step(N) dispatch
        embs = window_tower(tower_params, images, bboxes)
        for _ in range(n):
            state, _ = step(state, dict(batch, image_embeddings=embs),
                            *sargs)
            embs = window_tower(tower_params, images, bboxes)
        jax.block_until_ready(state)
        return state

    variants = {"A step-only": run_A, "B tower-first": run_B,
                "C prefetched": run_C}
    states = {k: jax.tree.map(jnp.copy, state0) for k in variants}
    del state0
    # compile + warm
    for k, fn in variants.items():
        states[k] = fn(states[k], 1)

    best = {k: float("inf") for k in variants}
    for r in range(args.rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            states[k] = fn(states[k], args.iters)
            dt = (time.perf_counter() - t0) / args.iters
            best[k] = min(best[k], dt)
            print(f"round {r} {k}: {dt * 1e3:.2f} ms/step")

    a, b, c = (best["A step-only"], best["B tower-first"],
               best["C prefetched"])
    print(f"\nbest-of: A {a * 1e3:.2f} | B {b * 1e3:.2f} | C {c * 1e3:.2f} "
          f"ms/step")
    verdict = ("overlap found — revisit the trainer's dispatch order"
               if c < b - 0.5e-3 else
               "NO overlap — single-core serialization confirmed")
    print(f"tower marginal: tower-first +{(b - a) * 1e3:.2f} ms, "
          f"prefetched +{(c - a) * 1e3:.2f} ms ({verdict})")


if __name__ == "__main__":
    main()
