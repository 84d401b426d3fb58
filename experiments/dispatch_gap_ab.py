"""Attribute the train step's wall-vs-device gap (VERDICT r4 #5).

The round-4 roofline run recorded 39.0 ms of device time inside a
47.3 ms wall step — 8.3 ms (17.5%) unattributed.  Two hypotheses:
(a) tunnel dispatch artifact (this machine drives the chip through a
remote tunnel; CLAUDE.md documents multi-ms per-dispatch gaps that vary
~5x between processes), or (b) real per-step host/dispatch overhead that
a multi-step scan would recover.

A/B, one process, same compiled step function:

  dispatched   K host-dispatched train steps, clock stopped by a 4-byte
               scalar fetch off the final state (the bench/production
               drive mode)
  scanned      ONE dispatch executing K steps inside lax.scan (donated
               carry; rng folded per step so no two iterations CSE)

If scanned ~= device time and dispatched pays the gap, the gap is
dispatch; its size HERE includes the tunnel, so the honest claim for
untunneled production is "at most this".  The scanned mode is what
`lax.scan`-based drivers would ship.

Usage (TPU machine):  python experiments/dispatch_gap_ab.py [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--classes", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from rangeclip_tpu.losses.hybrid import HybridLossConfig
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
    from rangeclip_tpu.training.optim import make_optimizer
    from rangeclip_tpu.training.state import create_train_state
    from rangeclip_tpu.training.train_step import make_train_step

    A, B, res, C, D = args.accum, args.batch, args.res, args.classes, 512
    K = args.steps

    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)
    opt = make_optimizer(0.0)
    state = create_train_state(jax.random.key(0), cfg, opt, (B, res, res, 1))
    loss_cfg = HybridLossConfig()
    step = make_train_step(model, opt, loss_cfg, accum_steps=A)

    rngnp = np.random.default_rng(0)
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
    text = jnp.asarray(rngnp.standard_normal((C, D)).astype(np.float32))
    med = jnp.zeros((C, C), jnp.bool_)
    consts = (jnp.float32(1e-4), jnp.float32(0.25), jnp.float32(0.5))

    def run_dispatched(state0):
        st = state0
        for i in range(K):
            st, info = step(st, batch, jax.random.fold_in(jax.random.key(5), i),
                            *consts, text, med, med)
        return st, info

    @jax.jit
    def run_scanned(state0):
        def body(st, i):
            st, info = step(st, batch, jax.random.fold_in(jax.random.key(5), i),
                            *consts, text, med, med)
            return st, info["total_loss"]

        st, losses = jax.lax.scan(body, state0,
                                  jnp.arange(K, dtype=jnp.int32))
        return st, losses[-1]

    def fetch(st):
        # 4-byte scalar fetch forces completion (block_until_ready does
        # not reliably synchronize through the tunnel)
        return float(jax.device_get(jnp.sum(
            st.params["log_temperature_text"].astype(jnp.float32))))

    state_a = jax.tree.map(jnp.copy, state)
    st, _ = run_dispatched(state_a)
    fetch(st)  # compile + warm
    st2, _ = run_scanned(jax.tree.map(jnp.copy, state))
    fetch(st2)
    print("# compiled both", file=sys.stderr, flush=True)

    best = {"dispatched": 1e9, "scanned": 1e9}
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        st, _ = run_dispatched(jax.tree.map(jnp.copy, state))
        fetch(st)
        best["dispatched"] = min(best["dispatched"],
                                 (time.perf_counter() - t0) / K * 1e3)
        t0 = time.perf_counter()
        st2, _ = run_scanned(jax.tree.map(jnp.copy, state))
        fetch(st2)
        best["scanned"] = min(best["scanned"],
                              (time.perf_counter() - t0) / K * 1e3)

    gap = best["dispatched"] - best["scanned"]
    print(f"\n## wall-vs-device gap A/B (bf16 {A}x{B} @ {res}^2, C={C}, "
          f"K={K} steps, best-of-{args.rounds})")
    print(f"dispatched: {best['dispatched']:.1f} ms/step   "
          f"scanned (1 dispatch): {best['scanned']:.1f} ms/step   "
          f"gap: {gap:.1f} ms/step ({100 * gap / best['dispatched']:.0f}%)")
    print("interpretation: the scanned number is the device's real step "
          "time; the gap is per-dispatch host+tunnel latency on THIS "
          "machine (an upper bound for untunneled production hosts).")


if __name__ == "__main__":
    main()
