"""A/B: fused conv+top-k kernel — XLA-padded input vs in-kernel edges.

The fused head kernel (ops/pallas/conv_score_topk.py) consumes a
transposed-and-zero-padded [h+2, C, (w+2)B] operand built by three XLA
passes (~1.3 ms/call in the predict roofline).  The candidate
alternative keeps only the transpose and handles borders in-kernel
(clamped halo index maps + edge masking/concat).  A first cross-process
comparison said the in-kernel form was SLOWER — but it ran while the CPU
test suite was saturating the host, and a later rerun of the SAME
baseline code dropped 6,900 -> 6,051 maps/s, so that reading is void
(the tunnel/process-contention lesson, CLAUDE.md).  This script settled
it in ONE process with device-side loop differencing: edges 5.24 ms vs
padded 5.79 ms — the in-kernel form SHIPPED (conv_score_topk.py); the
padded variant lives here for re-measurement.

Run on the TPU machine:  python experiments/conv_topk_prep_ab.py
"""

import functools
import time

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rangeclip_tpu.ops.pallas.conv_score_topk import (
    _INT_MIN,
    fused_conv_score_topk,
)

B, H, W, CIN, S, K = 128, 128, 128, 32, 384, 5
SC = 4


def _kernel_padded(x0_ref, x1_ref, x2_ref, wt_ref, ids_ref, idx_ref, *,
                   top_k, n_slices, tn, lane_b, n_rows):
    """The superseded variant: consumes an XLA-padded [h+2, C, (w+2)B]
    operand (no in-kernel edge logic) — kept here so the comparison can
    be re-measured; the SHIPPED kernel is the in-kernel-edges form."""
    del n_rows
    C_in = x0_ref.shape[1]
    S_ = wt_ref.shape[0]
    slabs = (x0_ref[0], x1_ref[0], x2_ref[0])
    ids = ids_ref[:].reshape(S_, 1)
    add = jnp.int32(0xFFFF) - ids
    for s in range(n_slices):
        parts = []
        for dy in range(3):
            base = slabs[dy]
            for dx in range(3):
                lo = s * tn + dx * lane_b
                parts.append(base[:, lo:lo + tn])
        patches = jnp.concatenate(parts, axis=0)
        scores = jax.lax.dot_general(
            wt_ref[:], patches,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sb = scores.astype(jnp.bfloat16)
        regs = [jnp.full((8, tn), _INT_MIN, jnp.int32) for _ in range(top_k)]
        for c in range(S_ // 8):
            b = jax.lax.bitcast_convert_type(
                sb[c * 8:(c + 1) * 8, :].astype(jnp.float32), jnp.int32)
            idc = ids[c * 8:(c + 1) * 8]
            tc = (b ^ ((b >> 31) & jnp.int32(0x7FFF0000))) \
                + add[c * 8:(c + 1) * 8]
            tc = jnp.where(idc >= 0, tc, jnp.int32(_INT_MIN))
            for k in range(top_k):
                hi = jnp.maximum(regs[k], tc)
                tc = jnp.minimum(regs[k], tc)
                regs[k] = hi
        pool = jnp.concatenate(regs, axis=0)

        def emit(k, pool):
            m = jnp.max(pool, axis=0)
            valid = m != jnp.int32(_INT_MIN)
            gid = jnp.where(valid,
                            jnp.int32(0xFFFF) - (m & jnp.int32(0xFFFF)),
                            jnp.int32(-1))
            idx_ref[k, s * tn:(s + 1) * tn] = gid
            return jnp.where(pool == m[None, :], jnp.int32(_INT_MIN), pool)

        jax.lax.fori_loop(0, top_k, emit, pool, unroll=True)


def fused_padded(features, folded_kernel, ids):
    h, w, C_in = H, W, CIN
    x = jnp.transpose(features, (1, 3, 2, 0))
    x = jnp.pad(x, ((1, 1), (0, 0), (1, 1), (0, 0)))
    x = x.reshape(h + 2, C_in, (w + 2) * B)
    wt = jnp.transpose(folded_kernel, (3, 0, 1, 2)).reshape(S, 9 * C_in)
    wt = wt.astype(features.dtype)
    tn = SC * B
    kernel = functools.partial(_kernel_padded, top_k=K, n_slices=w // SC,
                               tn=tn, lane_b=B, n_rows=h)
    row_block = (1, C_in, (w + 2) * B)
    out = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec(row_block, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i: (i + 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 9 * C_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((K, w * B), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, h * w * B), jnp.int32)],
    )(x, x, x, wt, ids.astype(jnp.int32))
    return out[0]


def main():
    feats = jax.random.normal(jax.random.key(0), (B, H, W, CIN),
                              jnp.bfloat16)
    fold = jax.random.normal(jax.random.key(1), (3, 3, CIN, S),
                             jnp.bfloat16)
    ids = jnp.arange(S, dtype=jnp.int32).at[-44:].set(-1)
    jax.block_until_ready((feats, fold))

    def edges(f, k, i):
        # the SHIPPED kernel (in-kernel edges since round 5)
        idx, _ = fused_conv_score_topk(f, k, i, top_k=K, slice_cols=SC)
        return jnp.sum(idx.astype(jnp.int32))

    def padded(f, k, i):
        return jnp.sum(fused_padded(f, k, i).astype(jnp.int32))

    fns = {}
    for name, fn in (("padded", padded), ("edges", edges)):
        chk = int(jax.device_get(jax.jit(fn)(feats, fold, ids)))
        print(f"# {name}: checksum {chk}", flush=True)
        fns[name] = fn
    assert len({int(jax.device_get(jax.jit(f)(feats, fold, ids)))
                for f in fns.values()}) == 1

    def looped(fn, iters):
        @jax.jit
        def run(f, k, i):
            def body(j, acc):
                return acc + fn(f, k, i + (j & 1))
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
        return run

    N_LO, N_HI = 8, 68
    pairs = {name: (looped(fn, N_LO), looped(fn, N_HI))
             for name, fn in fns.items()}
    for lo, hi in pairs.values():  # compile + warm
        int(jax.device_get(lo(feats, fold, ids)))
        int(jax.device_get(hi(feats, fold, ids)))
    best = {}
    for r in range(8):
        for name, (lo, hi) in pairs.items():
            t0 = time.perf_counter()
            int(jax.device_get(lo(feats, fold, ids)))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(jax.device_get(hi(feats, fold, ids)))
            th = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9),
                             (th - tl) / (N_HI - N_LO) * 1e3)
    for n, v in best.items():
        print(f"{n}: {v:.2f} ms/call")


if __name__ == "__main__":
    main()
