"""A/B: folded-head top-k selection — knockout loop vs bf16 packed-key
sorted-insert (ops/pallas/score_topk.py ``selector=``).

The folded predict head leaves one kernel on the device: masked top-5
over the conv-emitted [h, w, B, S] bf16 candidate-score field.  The
knockout formulation runs five max/compare/masked-min/knockout passes
over the [S, TN] tile (~20 S-traversals of VPU work — measured 6.1 ms
at the bench scale, 3x the field's ~2 ms HBM read roofline).  The
packed-key variant folds value+id into one monotone int32 (bf16's zero
low mantissa bits make this exact) and replaces the passes with one
sorted-insert sweep in [8, TN] chunks plus a cheap 8k-row knockout.

Standalone selection kernel A/B at the exact bench-config shape,
interleaved rounds in ONE process, checksum-identity enforced.

Run on the TPU machine:  python experiments/select_ab.py
"""

import time

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

H, W, B, S, K = 128, 128, 128, 384, 5
ROUNDS, ITERS = 6, 20


def main():
    # generate ON-DEVICE: a 1.6 GB host->device transfer can hang the
    # tunnel (CLAUDE.md)
    field = jax.random.normal(jax.random.key(3), (H, W, B, S),
                              jnp.bfloat16)
    ids = jnp.arange(S, dtype=jnp.int32) + 17  # ascending global ids
    jax.block_until_ready(field)
    print("# field ready", flush=True)

    import rangeclip_tpu.ops.pallas.score_topk as sk

    def run(f, i, selector, tile_elems=None):
        # f/i are jit ARGUMENTS — a 0-arg closure would bake the 1.6 GB
        # field into the program as a literal and stall XLA for tens of
        # minutes (measured; don't re-learn)
        if tile_elems is not None:
            orig = sk._tile_axis
            sk._tile_axis = (
                lambda axis, inner, limit=None: orig(axis, inner,
                                                     limit=tile_elems))
        try:
            # the unjitted wrapper: monkeypatched tiling must retrace
            idx, val = fused_score_topk.__wrapped__(
                f, i, top_k=K, want_values=True, selector=selector,
                max_id=S + 16)
        finally:
            if tile_elems is not None:
                sk._tile_axis = orig
        # pure reductions so XLA elides any padded-layout materialization
        # (the bench checksum rule, CLAUDE.md).  The int32 index sum wraps
        # (deterministic modular arithmetic over ~50M values without x64) —
        # cross-variant EQUALITY is still exact, but the printed value is
        # the wrapped sum, not the true index total.
        return (jnp.sum(idx.astype(jnp.int32)),
                jnp.sum(val.astype(jnp.float32)))

    import functools

    run_j = {
        "knockout": jax.jit(functools.partial(run, selector="knockout")),
        # the knockout-sized tile, to separate selector from tile gains
        "packed768k": jax.jit(functools.partial(run, selector="packed",
                                                tile_elems=768 * 1024)),
        # packed's shipped default (double tile: its working set is
        # lighter — i32 keys replace the f32 scores and the knockout's
        # live copies).  Measured 7.66 / 5.84 / 5.67 ms on-chip.
        "packed": jax.jit(functools.partial(run, selector="packed")),
    }
    sums = {}
    for s in run_j:
        print(f"# compiling+running {s} ...", flush=True)
        sums[s] = jax.device_get(run_j[s](field, ids))
        print(f"# {s} done", flush=True)
    print("# checksums:", {k: (int(v[0]), float(v[1]))
                           for k, v in sums.items()})
    for name, v in sums.items():
        assert int(v[0]) == int(sums["knockout"][0]), f"{name} idx mismatch"
        assert float(v[1]) == float(sums["knockout"][1]), \
            f"{name} val mismatch"

    best = {s: float("inf") for s in run_j}
    for r in range(ROUNDS):
        for name, fn in run_j.items():
            out = fn(field, ids)
            jax.block_until_ready(out)  # warm/compile outside the timer
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(field, ids)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / ITERS)
        print(f"# round {r}: " + ", ".join(
            f"{k} {v * 1e3:.2f} ms" for k, v in best.items()))
    ratio = best["knockout"] / best["packed"]
    print(f"VERDICT: packed selection is {ratio:.3f}x the knockout kernel "
          f"({best['knockout']*1e3:.2f} -> {best['packed']*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
