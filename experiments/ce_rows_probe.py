"""Probe: isolated fused-CE fwd / fwd+bwd time vs row-tile size, full-C
and packed-contrast forms, at the canonical 1x32 @ 256^2 native-res
training shapes (field [32, 128, 128, 512] bf16, S=4 label slots).

The packed form (K=128) removed 4x of the class-axis work but the
measured forward barely moved (5.84 -> 5.93 ms in the step profile),
so the fwd is bound by something C-invariant — per-grid-step overhead
is the usual suspect (RANGECLIP_CE_ROWS_FWD default 8 => 512 grid
steps).  The env knobs are read at TRACE time, so one process sweeps
them.  Run on the TPU machine: python experiments/ce_rows_probe.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, D, C, K, S = 32, 128, 128, 512, 512, 128, 4
ROUNDS, ITERS = 4, 20


def main():
    from rangeclip_tpu.losses.infonce import pack_contrast_set
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce
    from rangeclip_tpu.utils.math import l2_normalize

    rng = np.random.default_rng(0)
    N = B * H * W
    samples = jnp.asarray(
        rng.standard_normal((B, H, W, D)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(1, 40, (S, N)), jnp.int32)
    valid = jnp.asarray((rng.random((S, N)) > 0.2), jnp.float32) * 0.25
    text = l2_normalize(
        jnp.asarray(rng.standard_normal((C, D)), jnp.float32), axis=-1)
    mask_np = np.zeros(C, bool)
    mask_np[:90] = True  # ~ present labels + 50 distractors
    mask = jnp.asarray(mask_np)
    ids, table, pmask = pack_contrast_set(mask, text, K)
    t0 = jnp.float32(0.07)

    def build(name, rows_fwd, rows_bwd):
        os.environ["RANGECLIP_CE_ROWS_FWD"] = str(rows_fwd)
        os.environ["RANGECLIP_CE_ROWS_BWD"] = str(rows_bwd)
        if name == "full":
            def loss(s, t):
                return fused_pixel_text_ce(s, t, labels, valid, text, mask)
        else:
            def loss(s, t):
                return fused_pixel_text_ce(s, t, labels, valid, table,
                                           pmask, 512, False, ids)
        fwd = jax.jit(loss)
        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        v1 = fwd(samples, t0)
        (v2, _) = vg(samples, t0)
        jax.block_until_ready((v1, v2))
        assert abs(float(v1) - float(v2)) < 1e-3 * abs(float(v1))
        return fwd, vg, float(v1)

    configs = [
        ("full", 8, 2), ("full", 16, 2),
        ("packed", 8, 8), ("packed", 16, 8), ("packed", 16, 16),
        ("packed", 32, 16),
    ]
    built = {}
    for cfg in configs:
        try:
            built[cfg] = build(*cfg)
            print(f"# built {cfg}: loss {built[cfg][2]:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM rejections expected
            print(f"# {cfg} REJECTED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    best = {cfg: [float("inf"), float("inf")] for cfg in built}
    for r in range(ROUNDS):
        for cfg, (fwd, vg, _) in built.items():
            t = time.perf_counter()
            for _ in range(ITERS):
                out = fwd(samples, t0)
            jax.block_until_ready(out)
            best[cfg][0] = min(best[cfg][0],
                               (time.perf_counter() - t) / ITERS)
            t = time.perf_counter()
            for _ in range(ITERS):
                out = vg(samples, t0)
            jax.block_until_ready(out)
            best[cfg][1] = min(best[cfg][1],
                               (time.perf_counter() - t) / ITERS)
        print(f"# round {r} done", flush=True)
    for cfg, (f, fb) in best.items():
        print(f"RESULT {cfg}: fwd {f*1e3:.2f} ms, fwd+bwd {fb*1e3:.2f} ms")


if __name__ == "__main__":
    main()
