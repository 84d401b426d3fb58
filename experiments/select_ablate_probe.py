"""Stage ablation of the packed-key folded-head selection kernel
(ops/pallas/score_topk.py _select_kernel_packed) at the bench scale.

The predict-side roofline table (experiments/predict_roofline.py) shows
the selection kernel at ~4 ms — 50% of its 2.0 ms HBM-read roofline, the
worst under-bound interval of the whole predict path.  Per the round-4
lesson ("bound by neither roofline -> suspect in-kernel relayouts, run a
stage ablation before believing VPU-bound"), this probe times the kernel
with successive stages removed:

  load       input-block DMA only (BlockSpec fetches the whole tile
             regardless of use), constant output
  transpose  + in-register [TN, S] -> [S, TN] bf16 transpose
  key        + f32 widen / bitcast / monotone-key / id-pack arithmetic
  cascade    + the S/8-chunk sorted-insert sweep into k registers
  full       + the 8k-row pool knockout + id/value decode (the shipped
             kernel via fused_score_topk)

plus key-arithmetic variants on the full kernel (keyfast: fold the
|0xFFFF / -id steps into one precomputed additive [S,1] vector — key =
(b ^ ((b>>31) & 0x7FFF0000)) + (0xFFFF - id), exact because bf16-widened
scores have zero low mantissa bits) and tile-size variants.

Run on the TPU machine:  python experiments/select_ablate_probe.py
"""

import functools
import time

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, B, S, K = 128, 128, 128, 384, 5
ROUNDS, ITERS = 6, 20
_INT_MIN = -(2 ** 31)

STAGES = ["load", "transpose", "key", "cascade", "full", "keyfast",
          "chunkkey", "chunkkey16"]


def _chunk_kernel(scores_ref, ids_ref, idx_ref, *, via_i16: bool):
    """Key arithmetic computed PER 8-ROW CHUNK inside the insert loop —
    no [S, TN] f32/i32 intermediate ever materializes (only the bf16
    transpose), shrinking the VMEM working set so input double-buffering
    can overlap the VPU work.  keyfast arithmetic (key = m' + (0xFFFF -
    id), exact for bf16-widened scores).  ``via_i16`` widens bf16 bits
    i16 -> i32 << 16 instead of astype(f32) + bitcast (f32 bits of a
    widened bf16 are exactly bits16 << 16)."""
    scores = scores_ref[:]
    scores = scores.reshape(-1, scores.shape[-1])
    tn = scores.shape[0]
    ids = ids_ref[:].reshape(S, 1)
    t = scores.T  # [S, TN] bf16
    add = jnp.where(ids >= 0, jnp.int32(0xFFFF) - ids, jnp.int32(0))
    regs = [jnp.full((8, tn), _INT_MIN, jnp.int32) for _ in range(K)]
    for c in range(S // 8):
        tc16 = t[c * 8:(c + 1) * 8, :]
        if via_i16:
            b = jax.lax.convert_element_type(
                jax.lax.bitcast_convert_type(tc16, jnp.int16),
                jnp.int32) << 16
        else:
            b = jax.lax.bitcast_convert_type(tc16.astype(jnp.float32),
                                             jnp.int32)
        ac = add[c * 8:(c + 1) * 8]
        idc = ids[c * 8:(c + 1) * 8]
        tc = (b ^ ((b >> 31) & jnp.int32(0x7FFF0000))) + ac
        tc = jnp.where(idc >= 0, tc, jnp.int32(_INT_MIN))
        for i in range(K):
            hi = jnp.maximum(regs[i], tc)
            tc = jnp.minimum(regs[i], tc)
            regs[i] = hi
    pool = jnp.concatenate(regs, axis=0)

    def emit(i, pool):
        m = jnp.max(pool, axis=0)
        valid = m != jnp.int32(_INT_MIN)
        gid = jnp.where(valid,
                        jnp.int32(0xFFFF) - (m & jnp.int32(0xFFFF)),
                        jnp.int32(-1))
        idx_ref[i, :] = gid
        return jnp.where(pool == m[None, :], jnp.int32(_INT_MIN), pool)

    jax.lax.fori_loop(0, K, emit, pool, unroll=True)


def make_kernel(stage):
    if stage.startswith("chunkkey"):
        return functools.partial(_chunk_kernel,
                                 via_i16=stage == "chunkkey16")
    lvl = STAGES.index(stage) if stage in STAGES[:5] else 99

    def kernel(scores_ref, ids_ref, idx_ref):
        scores = scores_ref[:]
        scores = scores.reshape(-1, scores.shape[-1])  # [TN, S]
        tn = scores.shape[0]
        if lvl == 0:  # load
            for i in range(K):
                idx_ref[i, :] = jnp.full((tn,), i, jnp.int32)
            return
        ids = ids_ref[:].reshape(S, 1)
        t = scores.T  # [S, TN] bf16 in-register transpose
        if lvl == 1:  # transpose
            for i in range(K):
                idx_ref[i, :] = t[i, :].astype(jnp.int32)
            return
        if stage == "keyfast":
            b = jax.lax.bitcast_convert_type(t.astype(jnp.float32),
                                             jnp.int32)
            add = jnp.int32(0xFFFF) - ids
            key = (b ^ ((b >> 31) & jnp.int32(0x7FFF0000))) + add
            key = jnp.where(ids >= 0, key, jnp.int32(_INT_MIN))
        else:
            b = jax.lax.bitcast_convert_type(t.astype(jnp.float32),
                                             jnp.int32)
            key = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
            key = (key | jnp.int32(0xFFFF)) - ids
            key = jnp.where(ids >= 0, key, jnp.int32(_INT_MIN))
        if lvl == 2:  # key
            for i in range(K):
                idx_ref[i, :] = key[i, :]
            return
        regs = [jnp.full((8, tn), _INT_MIN, jnp.int32) for _ in range(K)]
        for c in range(S // 8):
            tc = key[c * 8:(c + 1) * 8, :]
            for i in range(K):
                hi = jnp.maximum(regs[i], tc)
                tc = jnp.minimum(regs[i], tc)
                regs[i] = hi
        if lvl == 3:  # cascade
            for i in range(K):
                idx_ref[i, :] = regs[i][0, :]
            return
        pool = jnp.concatenate(regs, axis=0)

        def emit(i, pool):
            m = jnp.max(pool, axis=0)
            valid = m != jnp.int32(_INT_MIN)
            gid = jnp.where(valid,
                            jnp.int32(0xFFFF) - (m & jnp.int32(0xFFFF)),
                            jnp.int32(-1))
            idx_ref[i, :] = gid
            return jnp.where(pool == m[None, :], jnp.int32(_INT_MIN), pool)

        jax.lax.fori_loop(0, K, emit, pool, unroll=True)

    return kernel


def build(stage, wt=32):
    grid = (H, W // wt)
    tn = wt * B

    def one(field, ids):
        out = pl.pallas_call(
            make_kernel(stage),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, wt, B, S), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S,), lambda i, j: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, tn),
                                   lambda i, j: (0, i * (W // wt) + j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, H * W * B), jnp.int32),
        )(field, ids)
        return jnp.sum(out.astype(jnp.int32))

    return one


def looped(one, iters):
    """Device-side loop, scalar fetch — the ONLY reliable timing through
    the tunnel (conv_width_probe recipe).  Iteration-dependence goes
    through the tiny [S] ids array so no field-scale traffic is added."""

    @jax.jit
    def run(field, ids):
        def body(i, acc):
            return acc + one(field, ids + (i & 1))

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    return run


def main():
    field = jax.random.normal(jax.random.key(3), (H, W, B, S),
                              jnp.bfloat16)
    ids = jnp.arange(S, dtype=jnp.int32) + 17
    jax.block_until_ready(field)
    print("# field ready", flush=True)

    variants = [(s, 32) for s in STAGES] + [
        ("full", 16), ("keyfast", 16), ("chunkkey", 64), ("chunkkey16", 64)]
    N_LO, N_HI = 8, 48
    fns, sums = {}, {}
    for stage, wt in variants:
        name = f"{stage}@wt{wt}"
        try:
            one = build(stage, wt)
            sums[name] = int(jax.device_get(jax.jit(one)(field, ids)))
            lo, hi = looped(one, N_LO), looped(one, N_HI)
            int(jax.device_get(lo(field, ids)))
            int(jax.device_get(hi(field, ids)))
            fns[name] = (lo, hi)
            print(f"# {name}: compiled, checksum {sums[name]}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe records rejections
            print(f"# {name}: REJECTED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    best = {}
    for r in range(ROUNDS):
        for name, (lo, hi) in fns.items():
            t0 = time.perf_counter()
            int(jax.device_get(lo(field, ids)))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(jax.device_get(hi(field, ids)))
            th = time.perf_counter() - t0
            dt = (th - tl) / (N_HI - N_LO) * 1e3
            best[name] = min(best.get(name, 1e9), dt)
    print("\n# stage (cumulative)        ms best-of-%d "
          "(device-side loop differencing)" % ROUNDS)
    for name in fns:
        print(f"{name:24s}  {best[name]:7.2f} ms")
    gb = H * W * B * S * 2 / 1e9
    print(f"\n# field {gb:.2f} GB; HBM-read floor @819 GB/s = "
          f"{gb / 819 * 1e3:.2f} ms")
    if "full@wt32" in sums and "keyfast@wt32" in sums:
        print("# keyfast checksum identical to full:",
              sums["full@wt32"] == sums["keyfast@wt32"])


if __name__ == "__main__":
    main()
