"""On-chip ablation probe: WHERE does the CE forward kernel's time go?

The per-interval roofline table (experiments/roofline_table.py) shows the
CE pair at 16% of its MXU roofline and ~101 GB/s effective — bound by
neither roofline.  Prior probes established the fwd is invariant to C and
the row tile (experiments/ce_rows_probe.py), pointing at per-[N, D]-element
work.  This probe times stripped variants of the forward kernel at the
canonical packed config (bf16 1x32 @ 256^2 native field, K=128, rh=16) to
attribute the gap:

  load      - DMA + reduce only (the pipelining floor)
  astype    - + bf16 -> f32 convert of the field tile
  norm      - + L2 normalize (square, lane-reduce, rsqrt, scale)
  mm        - + scoring matmul [TN, D] x [D, K] (bf16 MXU, f32 accum)
  mask      - + mask select to NEG_INF
  softmax   - + max/exp/log lse pass
  slots     - + S=4 label-slot compare/pick loop  (== the real kernel)

Run:  python experiments/ce_ablate_probe.py  (TPU; ~2 min)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

NEG_INF = -1e30
B, H, W, D, K, S = 32, 128, 128, 512, 128, 4
RH = 16
STAGES = ["load", "astype", "norm", "mm", "mask", "softmax", "slots"]


def make_kernel(stage):
    lvl = STAGES.index(stage)

    def kernel(inv_temp_ref, samples_ref, labels_ref, valid_ref, text_ref,
               mask_ref, ids_ref, ce_ref):
        s = samples_ref[:]
        s = s.reshape(-1, s.shape[-1])
        TN = s.shape[0]
        if lvl == 0:  # load: touch every element, cheapest reduce
            ce_ref[0, :] = jnp.sum(s.astype(jnp.float32), axis=1)
            return
        s = s.astype(jnp.float32)
        if lvl == 1:
            ce_ref[0, :] = jnp.sum(s, axis=1)
            return
        sq = jnp.sum(s * s, axis=1, keepdims=True)
        rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        emb = s * rs
        if lvl == 2:
            ce_ref[0, :] = jnp.sum(emb, axis=1)
            return
        sim = jax.lax.dot_general(
            emb.astype(text_ref.dtype), text_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if lvl == 3:
            ce_ref[0, :] = jnp.sum(sim, axis=1)
            return
        logits = jnp.where(mask_ref[:][None, :] != 0,
                           sim * inv_temp_ref[0], NEG_INF)
        if lvl == 4:
            ce_ref[0, :] = jnp.sum(jnp.maximum(logits, -1.0), axis=1)
            return
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1))
        if lvl == 5:
            ce_ref[0, :] = lse
            return
        cols = jnp.broadcast_to(ids_ref[:], (TN, K))
        wsum = jnp.zeros((TN,), jnp.float32)
        wpick = jnp.zeros((TN,), jnp.float32)
        for si in range(S):
            onehot = cols == labels_ref[si, :][:, None]
            picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=1)
            w = valid_ref[si, :]
            wsum = wsum + w
            wpick = wpick + w * picked
        ce_ref[0, :] = wsum * lse - wpick

    return kernel


def make_kernel_t(stage):
    """CLASS-MAJOR variant: scores computed [K, TN] (classes on sublanes,
    rows on lanes), so the label compare broadcasts the [S, TN] lane-
    aligned label row over sublanes for FREE, the softmax/pick reductions
    are sublane reductions, and the [1, TN] output row needs no final
    relayout — the score_topk.py lesson applied to CE."""
    # Only the top two stages exist class-major; an earlier ablation stage
    # would silently run the FULL slots kernel and mislabel its timing.
    assert stage in ("softmax", "slots"), (
        f"class-major variant implements only softmax/slots, got {stage!r}")
    lvl = STAGES.index(stage)

    def kernel(inv_temp_ref, samples_ref, labels_ref, valid_ref, text_ref,
               mask_ref, ids_ref, ce_ref):
        s = samples_ref[:]
        s = s.reshape(-1, s.shape[-1])
        TN = s.shape[0]
        s = s.astype(jnp.float32)
        sq = jnp.sum(s * s, axis=1, keepdims=True)
        rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        emb = s * rs
        sim = jax.lax.dot_general(
            text_ref[:], emb.astype(text_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, TN]
        logits = jnp.where(mask_ref[:][:, None] != 0,
                           sim * inv_temp_ref[0], NEG_INF)
        m = jnp.max(logits, axis=0, keepdims=True)  # [1, TN]
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=0,
                                  keepdims=True))
        if lvl == 5:
            ce_ref[:] = lse
            return
        ids_col = ids_ref[:]  # [K, 1] lane-replicated
        wsum = jnp.zeros((1, TN), jnp.float32)
        wpick = jnp.zeros((1, TN), jnp.float32)
        for si in range(S):
            lab = labels_ref[si, :][None, :]  # [1, TN] lane-aligned
            onehot = ids_col == lab           # [K, TN]
            picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=0,
                             keepdims=True)
            w = valid_ref[si, :][None, :]
            wsum = wsum + w
            wpick = wpick + w * picked
        ce_ref[:] = wsum * lse - wpick

    return kernel


def build(stage, rh=RH, transposed=False):
    hb = H // rh
    grid = (B * hb,)
    row_tile = rh * W
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, rh, W, D), lambda i: (i // hb, i % hb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, row_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, row_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if transposed else
        pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    kern = make_kernel_t(stage) if transposed else make_kernel(stage)

    def f(samples, inv_temp, labels, valid, text, mask, ids):
        ce = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, row_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B * H * W), jnp.float32),
        )(inv_temp, samples, labels, valid, text, mask,
          ids.reshape(K, 1) if transposed else ids)
        return jnp.sum(ce)

    return jax.jit(f)


def make_bwd_kernel(transposed):
    """Replicates ops/pallas/pixel_text_ce._bwd_kernel's math at this
    config (row-major) or the class-major rewrite candidate."""

    def row_major(inv_temp_ref, coeff_ref, samples_ref, labels_ref,
                  valid_ref, text_ref, mask_ref, ids_ref, dsamples_ref,
                  dtau_ref):
        s = samples_ref[:]
        shape4 = s.shape
        s = s.reshape(-1, s.shape[-1]).astype(jnp.float32)
        TN = s.shape[0]
        sq = jnp.sum(s * s, axis=1, keepdims=True)
        rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        emb = s * rs
        sim = jax.lax.dot_general(
            emb.astype(text_ref.dtype), text_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = jnp.where(mask_ref[:][None, :] != 0,
                           sim * inv_temp_ref[0], NEG_INF)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        inv_z = 1.0 / jnp.sum(e, axis=1)
        cols = jnp.broadcast_to(ids_ref[:], (TN, K))
        wsum = jnp.zeros((TN,), jnp.float32)
        for si in range(S):
            wsum = wsum + coeff_ref[0] * valid_ref[si, :]
        delta = e * (wsum * inv_z)[:, None]
        wpick = jnp.zeros((TN,), jnp.float32)
        for si in range(S):
            onehot = cols == labels_ref[si, :][:, None]
            w = coeff_ref[0] * valid_ref[si, :]
            wpick = wpick + w * jnp.sum(jnp.where(onehot, logits, 0.0),
                                        axis=1)
            delta = delta - jnp.where(onehot, w[:, None], 0.0)
        exp_logit = jnp.sum(e * logits, axis=1) * inv_z
        dtau_ref[0, :] = wpick - wsum * exp_logit
        d_emb = jax.lax.dot_general(
            delta.astype(text_ref.dtype), text_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_temp_ref[0]
        proj = jnp.sum(emb * d_emb, axis=1, keepdims=True)
        d = (rs * (d_emb - emb * proj)).astype(dsamples_ref.dtype)
        dsamples_ref[:] = d.reshape(shape4)

    def class_major(inv_temp_ref, coeff_ref, samples_ref, labels_ref,
                    valid_ref, text_ref, mask_ref, ids_ref, dsamples_ref,
                    dtau_ref):
        s = samples_ref[:]
        shape4 = s.shape
        s = s.reshape(-1, s.shape[-1]).astype(jnp.float32)
        TN = s.shape[0]
        sq = jnp.sum(s * s, axis=1, keepdims=True)
        rs = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        emb = s * rs
        sim = jax.lax.dot_general(
            text_ref[:], emb.astype(text_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [K, TN]
        logits = jnp.where(mask_ref[:][:, None] != 0,
                           sim * inv_temp_ref[0], NEG_INF)
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        inv_z = 1.0 / jnp.sum(e, axis=0, keepdims=True)  # [1, TN]
        ids_col = ids_ref[:]  # [K, 1]
        wsum = jnp.zeros((1, TN), jnp.float32)
        for si in range(S):
            wsum = wsum + coeff_ref[0] * valid_ref[si, :][None, :]
        delta = e * (wsum * inv_z)
        wpick = jnp.zeros((1, TN), jnp.float32)
        for si in range(S):
            lab = labels_ref[si, :][None, :]
            onehot = ids_col == lab
            w = coeff_ref[0] * valid_ref[si, :][None, :]
            wpick = wpick + w * jnp.sum(jnp.where(onehot, logits, 0.0),
                                        axis=0, keepdims=True)
            delta = delta - jnp.where(onehot, w, 0.0)
        exp_logit = jnp.sum(e * logits, axis=0, keepdims=True) * inv_z
        dtau_ref[:] = wpick - wsum * exp_logit
        d_emb = jax.lax.dot_general(
            delta.astype(text_ref.dtype), text_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_temp_ref[0]
        proj = jnp.sum(emb * d_emb, axis=1, keepdims=True)
        d = (rs * (d_emb - emb * proj)).astype(dsamples_ref.dtype)
        dsamples_ref[:] = d.reshape(shape4)

    return class_major if transposed else row_major


def build_bwd(rh, transposed):
    hb = H // rh
    grid = (B * hb,)
    row_tile = rh * W
    sspec = pl.BlockSpec((1, rh, W, D), lambda i: (i // hb, i % hb, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        sspec,
        pl.BlockSpec((S, row_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, row_tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if transposed else
        pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    def f(samples, inv_temp, labels, valid, text, mask, ids):
        ds, dtau = pl.pallas_call(
            make_bwd_kernel(transposed),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                sspec,
                pl.BlockSpec((1, row_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, W, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, B * H * W), jnp.float32),
            ],
        )(inv_temp, jnp.full((1,), 0.37, jnp.float32), samples, labels,
          valid, text, mask, ids.reshape(K, 1) if transposed else ids)
        return jnp.sum(ds.astype(jnp.float32) ** 2) + jnp.sum(dtau)

    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    N = B * H * W
    samples = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.bfloat16)
    inv_temp = jnp.full((1,), 1.0 / 0.07, jnp.float32)
    labels = jnp.asarray(rng.integers(1, 512, (S, N)), jnp.int32)
    valid = jnp.asarray(rng.random((S, N)) > 0.2, jnp.float32)
    text = jnp.asarray(rng.standard_normal((K, D)), jnp.bfloat16)
    mask = jnp.ones((K,), jnp.int32)
    ids = jnp.asarray(np.sort(rng.choice(512, K, replace=False)),
                      jnp.int32).reshape(1, K)
    args = (samples, inv_temp, labels, valid, text, mask, ids)

    variants = [("slots", RH, False), ("slots", RH, True),
                ("slots", 32, True)]
    bwd_variants = [(2, False), (8, False), (2, True), (8, True),
                    (16, True)]

    fns, names = {}, []
    for stage, rh, tr in variants:
        name = f"fwd_{stage}{'_T' if tr else ''}_rh{rh}"
        names.append(name)
        try:
            fns[name] = build(stage, rh, tr)
            out = fns[name](*args)
            jax.block_until_ready(out)
            print(f"compiled {name}: checksum {float(out):.6e}", flush=True)
        except Exception as e:  # VMEM rejection etc.
            print(f"REJECTED {name}: {str(e)[:120]}", flush=True)
            names.pop()
    for rh, tr in bwd_variants:
        name = f"bwd{'_T' if tr else ''}_rh{rh}"
        names.append(name)
        try:
            fns[name] = build_bwd(rh, tr)
            out = fns[name](*args)
            jax.block_until_ready(out)
            print(f"compiled {name}: checksum {float(out):.6e}", flush=True)
        except Exception as e:
            print(f"REJECTED {name}: {str(e)[:120]}", flush=True)
            names.pop()

    best = {n: float("inf") for n in names}
    for _ in range(4):
        for name in names:
            t0 = time.perf_counter()
            for _ in range(10):
                out = fns[name](*args)
            jax.block_until_ready(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / 10 * 1e3)

    print(f"\n## CE fwd ablation (bf16 field [{B},{H},{W},{D}], K={K}; "
          "best-of-4 x 10)")
    for name in names:
        print(f"{name:18s}  {best[name]:7.3f} ms")


if __name__ == "__main__":
    main()
