"""Per-interval roofline table for the BENCH predict path (VERDICT r4 #1).

The north-star bench number (maps/s @ 256^2, folded head, batch 128,
C=512, candidate capacity 384) has been flat at ~6.1k maps/s for three
rounds while the train step moved 18% the round its per-interval roofline
table landed.  This is that table for the predict path: run the exact
``bench.py`` program (same model, same folded predict, same checksum
reduction) under ``jax.profiler``, join the device trace with analytic
per-instruction bytes/FLOPs from the compiled HLO (utils/roofline.py),
bucket into model-level intervals, and print per interval: ms, achieved
GB/s and TFLOP/s, and % of that interval's OWN binding roofline.

Reference for the measured path: model.py:119-175 (predict) — here the
folded-head formulation (models/depth_unet.py predict_folded).

Usage (TPU machine):
    python experiments/predict_roofline.py [--iters 10] [--dump 40]
    python experiments/predict_roofline.py --predict default   # unfolded
"""

from __future__ import annotations

import argparse
import tempfile
import time

import numpy as np

# Ordered; first match wins.  The folded-head conv and the selection
# kernel live OUTSIDE the model.apply scope (predict_folded body), so
# they are distinguished from the in-model decoder convs by scope.
BUCKETS = [
    ("fused head conv+select (Pallas)", r"fused_conv_score_topk"),
    ("score/top-k select (Pallas)", r"pallas_call|score_topk"),
    ("encoder convs", r"depth_encoder"),
    ("decoder convs", r"depth_decoder"),
    # the folded conv fuses into the free [h,w,B,S] transpose relabel, so
    # its fusion carries the bare "jit(predict)/transpose" op name
    ("folded head conv", r"jit\(predict\)/(conv_general_dilated|transpose$)"),
    ("fold einsum (W @ T)", r"einsum|hwis"),
    ("candidate gather/normalize", r"l2_normalize|take|gather"),
    ("upsample/remap + checksum", r"resize|nearest|reduce_sum|convert"),
]

ASYNC_RE = __import__("re").compile(r"^[\w\-]+-(start|done)[.\d]*$")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--classes", type=int, default=512)
    ap.add_argument("--capacity", type=int, default=384)
    ap.add_argument("--predict", choices=["folded", "default"],
                    default="folded")
    ap.add_argument("--dump", type=int, default=0)
    ap.add_argument("--trace_dir", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rangeclip_tpu.models.depth_unet import (
        DepthUNet,
        DepthUNetConfig,
        build_candidate_indices,
        predict_folded,
    )
    from rangeclip_tpu.utils.platform import enable_compilation_cache
    from rangeclip_tpu.utils.profiling import (
        chip_peak_flops,
        chip_peak_hbm_bytes,
        summarize_trace,
    )
    from rangeclip_tpu.utils.roofline import (
        bucket_rows,
        format_interval_table,
        parse_hlo_instructions,
        roofline_rows,
    )

    enable_compilation_cache()
    B, res, C, TOP_K = args.batch, args.res, args.classes, 5

    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)
    depth = jax.random.normal(jax.random.key(100), (B, res, res, 1),
                              jnp.float32)
    variables = jax.jit(lambda k, d: model.init(k, d, train=False))(
        jax.random.key(1), depth)
    jax.block_until_ready(variables)
    text = jax.random.normal(jax.random.key(2), (C, 512), jnp.float32)
    seg = jax.random.randint(jax.random.key(3), (B, res, res), 0, 40)
    cand = build_candidate_indices(jax.random.key(4), seg, C, 300,
                                   capacity=args.capacity)

    folded = args.predict == "folded"

    @jax.jit
    def predict(variables, depth, text, cand):
        if folded:
            topk = predict_folded(model, variables, depth, text,
                                  top_k=TOP_K, candidate_indices=cand)
        else:
            topk, _, _ = model.apply(
                variables, depth, text, None, TOP_K,
                method=DepthUNet.predict, return_embeddings=False,
                candidate_indices=cand,
            )
        return jnp.sum(topk.reshape(-1).astype(jnp.float32))

    compiled = predict.lower(variables, depth, text, cand).compile()
    hlo = compiled.as_text()
    flops_per_call = float(compiled.cost_analysis().get("flops", 0.0))
    print(f"# compiled; HLO {len(hlo) / 1e6:.1f} MB text, "
          f"{flops_per_call / 1e9:.1f} GFLOP/call")

    # warm + wall timing (host-dispatch loop, like bench.py)
    chk = float(jax.device_get(predict(variables, depth, text, cand)))
    for _ in range(2):
        jax.block_until_ready(predict(variables, depth, text, cand))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(args.iters):
        acc = acc + predict(variables, depth, text, cand)
    jax.block_until_ready(acc)
    wall_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"# wall {wall_ms:.2f} ms/call = {B / wall_ms * 1e3:.0f} maps/s "
          f"(pre-profiler), checksum {chk:.0f}")

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="predict_roofline_")
    with jax.profiler.trace(trace_dir):
        acc = jnp.float32(0.0)
        for _ in range(args.iters):
            acc = acc + predict(variables, depth, text, cand)
        jax.block_until_ready(acc)

    rows_t = summarize_trace(trace_dir, steps=args.iters, hlo_text=hlo)
    rows_t = [r for r in rows_t if not r[0].startswith("conditional")]
    dev = jax.devices()[0]
    peak_fl, peak_by = chip_peak_flops(dev), chip_peak_hbm_bytes(dev)

    instrs = parse_hlo_instructions(hlo)
    # Analytic FLOPs: the pure selection kernel is compare/select work
    # (FLOPs 0 — judged against its bandwidth roofline); the FUSED
    # conv+select kernel carries the folded conv's real MXU FLOPs
    # (2 * N * 9*C_in * S at the native field size).
    n_pix = B * (res // 2) ** 2
    fused_flops = 2.0 * n_pix * 9 * 32 * args.capacity
    # key to the pallas_call row only — the prep transpose rows carry the
    # same jit scope in their op names
    rows = roofline_rows(rows_t, instrs, peak_fl, peak_by,
                         {"fused_conv_score_topk)/pallas_call": fused_flops})

    def _is_async(r):
        return bool(ASYNC_RE.match(r["instr"])) or (
            r["instr"].startswith("custom-call") and not r["op"]
            and r["ms"] < 1e-3)

    async_rows = [r for r in rows if _is_async(r)]
    rows = [r for r in rows if not _is_async(r)]
    total_ms = sum(r["ms"] for r in rows)

    if args.dump:
        print(f"\n## top {args.dump} instructions "
              "(ms | GB | GFLOP | bound | % own roofline | op)")
        for r in rows[: args.dump]:
            print(f"{r['ms']:8.3f}  {r['gb']:7.3f}  {r['gflop']:8.1f}  "
                  f"{r['bound']:4s}  {100 * r['attainment']:5.0f}%  "
                  f"{r['instr'][:26]:26s}  {r['op'][-70:]}")

    buckets = bucket_rows(rows, BUCKETS)
    print(f"\n## predict per-interval roofline ({args.predict} path, bf16 "
          f"batch {B} @ {res}^2, C={C}, capacity {args.capacity}; device "
          f"total {total_ms:.2f} ms/call, wall {wall_ms:.2f} ms)")
    print(format_interval_table(buckets, total_ms))
    a_ms = sum(r["ms"] for r in async_rows)
    print(f"\nasync DMA markers excluded: {len(async_rows)} rows, "
          f"{a_ms:.2f} ms visible")
    print(
        "\nfooter: bytes are analytic minimum operand+result traffic; "
        "the Pallas selection custom-call carries no analytic FLOPs "
        "(compare/select work — judged against its bandwidth roofline); "
        f"attainment = max(flop-time, byte-time) / measured time on "
        f"{dev.device_kind} (peaks {peak_fl / 1e12:.0f} TFLOP/s, "
        f"{peak_by / 1e9:.0f} GB/s)."
    )


if __name__ == "__main__":
    main()
