"""A/B: TV smoothness fwd+bwd — XLA sign-field VJP vs the one-pass
row-tile Pallas kernel (ops/pallas/tv_rowtile.py).

Two measurements, interleaved rounds in ONE process:
  1. standalone value_and_grad of the TV term at the canonical
     native-resolution train shape (32x128x128x512 bf16, upsample=2,
     all-ones sample weights — the shipped hybrid-loss call), and
  2. the REAL 1x32 @ 256^2 bf16 train step with the dispatch gate
     forced off (XLA) vs on (kernel).

Run on the TPU machine:  python experiments/tv_rowtile_ab.py
"""

import time

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import rangeclip_tpu.losses.smoothness as smooth_mod
import rangeclip_tpu.ops.pallas.tv_rowtile as tvk_mod
from rangeclip_tpu.losses.smoothness import total_variation_loss

B, H, W, D = 32, 128, 128, 512
ROUNDS, ITERS = 6, 10


def main():
    x = jax.random.normal(jax.random.key(0), (B, H, W, D), jnp.bfloat16)
    w = jnp.ones((B,), jnp.float32)
    jax.block_until_ready(x)
    orig_gate = tvk_mod.kernel_applicable

    def term(v):
        loss = total_variation_loss(v, upsample=2, sample_weight=w)
        return loss

    def make(variant):
        def fn(v):
            gate = orig_gate if variant == "kernel" else (
                lambda shape, dtype: False)
            tvk_mod.kernel_applicable = gate
            try:
                val, grad = jax.value_and_grad(term)(v)
            finally:
                tvk_mod.kernel_applicable = orig_gate
            # pure reductions keep padded layouts out of the checksum
            return val, jnp.sum(grad.astype(jnp.float32))

        return jax.jit(fn)

    fns = {name: make(name) for name in ("xla", "kernel")}
    outs = {name: jax.device_get(fn(x)) for name, fn in fns.items()}
    print("# value/gradsum:", {k: (float(v[0]), float(v[1]))
                               for k, v in outs.items()})
    assert abs(outs["xla"][0] - outs["kernel"][0]) <= 1e-5 * abs(
        outs["xla"][0])
    assert outs["xla"][1] == outs["kernel"][1], "grad checksum mismatch"

    best = {name: float("inf") for name in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            out = fn(x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / ITERS)
        print(f"# round {r}: " + ", ".join(
            f"{k} {v * 1e3:.2f} ms" for k, v in best.items()))
    ratio = best["xla"] / best["kernel"]
    print(f"VERDICT: row-tile TV fwd+bwd is {ratio:.3f}x the XLA VJP "
          f"({best['xla']*1e3:.2f} -> {best['kernel']*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
