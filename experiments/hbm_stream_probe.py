"""Practical HBM streaming rate vs the selection kernel's input DMA.

select_ablate_probe measured the packed selector's load-only stage at
~3.4 ms for a 1.61 GB field — 58% of the 819 GB/s paper peak.  Is that a
kernel pipelining problem or the machine's real streaming rate?  This
probe times, in ONE process (A/B law):

  xla_sum      jnp.sum over the same [h, w, B, S] bf16 field (XLA's own
               best-effort streaming reduce)
  xla_sum_f32  same but over an f32 view of half the elements (rules out
               bf16-upcast VPU cost shadowing the DMA)
  pallas_rN    a Pallas reduce with the selection kernel's exact
               BlockSpec geometry at several w-tile widths (DMA the
               block, emit one [8, 128] partial per step)

If xla_sum lands near the load-only time, ~480-580 GB/s IS the practical
stream rate and the selection kernel is near its real floor; if XLA
streams much faster, the kernel's block geometry is the problem.

Run on the TPU machine:  python experiments/hbm_stream_probe.py
"""

import time

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, B, S = 128, 128, 128, 384
ROUNDS, ITERS = 6, 20


def build_pallas_reduce(wt):
    grid = (H, W // wt)

    def kernel(x_ref, o_ref):
        x = x_ref[:].reshape(-1, x_ref.shape[-1])  # [TN, S] bf16
        # cheapest consume that cannot be DCE'd: one sublane strip summed
        o_ref[:, :] = x[:8, :128].astype(jnp.float32)

    def f(field):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, wt, B, S),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(field)
        return jnp.sum(out)

    return jax.jit(f)


def main():
    field = jax.random.normal(jax.random.key(3), (H, W, B, S),
                              jnp.bfloat16)
    jax.block_until_ready(field)
    gb = field.size * 2 / 1e9
    print(f"# field {gb:.2f} GB ready", flush=True)

    fns = {
        "xla_sum": jax.jit(lambda f: jnp.sum(f, dtype=jnp.float32)),
        "xla_sum_f32": jax.jit(
            lambda f: jnp.sum(
                jax.lax.bitcast_convert_type(
                    f.reshape(H, W, B, S // 2, 2), jnp.float32))),
    }
    for wt in (8, 16, 32, 64):
        fns[f"pallas_r{wt}"] = build_pallas_reduce(wt)

    for name, fn in list(fns.items()):
        try:
            jax.block_until_ready(fn(field))
            print(f"# {name}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: REJECTED {str(e).splitlines()[0][:100]}")
            del fns[name]

    # the tunnel does NOT reliably synchronize block_until_ready
    # (CLAUDE.md): force a 4-byte scalar fetch to stop the clock, and
    # DIFFERENCE two loop lengths so the fixed fetch/dispatch overhead
    # cancels (conv_width_probe recipe).
    best = {}
    for _ in range(ROUNDS):
        for name, fn in fns.items():
            times = {}
            for iters in (ITERS // 4, ITERS):
                acc = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(iters):
                    acc = acc + fn(field)
                float(jax.device_get(acc))
                times[iters] = time.perf_counter() - t0
            dt = (times[ITERS] - times[ITERS // 4]) \
                / (ITERS - ITERS // 4) * 1e3
            best[name] = min(best.get(name, 1e9), dt)

    print(f"\n# variant        ms     GB/s  (field {gb:.2f} GB, "
          f"paper peak 819 GB/s)")
    for name, dt in best.items():
        print(f"{name:14s}  {dt:6.2f}  {gb / dt * 1e3:6.0f}")


if __name__ == "__main__":
    main()
