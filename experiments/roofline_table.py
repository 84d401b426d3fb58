"""Per-interval roofline table for the canonical train step (VERDICT r3 #2).

Runs the bf16 1x32 @ 256^2 / C=512 train step (the README ledger config)
under jax.profiler, joins the device trace with per-instruction analytic
bytes/FLOPs parsed from the compiled HLO (utils/roofline.py), buckets the
instructions into model-level intervals, and prints the markdown table the
README's performance section carries: for each interval, ms, achieved GB/s
and TFLOP/s, and % of the interval's OWN binding roofline — replacing the
step-level "~50-100% bandwidth-bound" sentence with per-interval evidence.

Usage (TPU machine):
    python experiments/roofline_table.py [--steps 6] [--dump 40]
    python experiments/roofline_table.py --fp32   # parity-mode variant

``--dump N`` additionally prints the N most expensive raw instructions
with op names and per-instruction attainment (for bucket tuning and for
finding the worst under-bound fusion).
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np


BUCKETS = [
    ("encoder convs", r"depth_encoder"),
    ("decoder convs+head", r"depth_decoder"),
    ("CE fwd+bwd (Pallas)", r"pixel_text_ce|ce_fwd|ce_bwd"),
    ("TV fwd+bwd (Pallas)", r"tv_rowtile|tv_fwd|tv_bwd|smoothness"),
    ("l2-normalize (Pallas)", r"l2_normalize|l2norm"),
    ("pixel draw + histogram", r"histogram|random_bits|threefry|sample"),
    ("pooling/presence", r"masked_pooling|class_presence|pooling|presence"),
    ("image-contrast", r"area_image|image_contrast"),
    ("optimizer/adam", r"adam|optax|update_fn|apply_updates"),
    ("batch-norm", r"batch_stats|BatchNorm|bn_"),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--classes", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--dump", type=int, default=0)
    ap.add_argument("--trace_dir", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rangeclip_tpu.losses.hybrid import HybridLossConfig
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
    from rangeclip_tpu.training.optim import make_optimizer
    from rangeclip_tpu.training.state import create_train_state
    from rangeclip_tpu.training.train_step import make_train_step
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
    A, B, res, C, D = args.accum, args.batch, args.res, args.classes, 512
    bf16 = not args.fp32

    cfg = DepthUNetConfig(use_batch_norm=True,
                          dtype=jnp.bfloat16 if bf16 else None)
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
    sargs = (jax.random.key(5), jnp.float32(1e-4), jnp.float32(0.25),
             jnp.float32(0.5), text, med, med)

    lowered = step.lower(state, batch, *sargs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"# compiled; HLO {len(hlo) / 1e6:.1f} MB text")

    sstate, _ = step(jax.tree.map(jnp.copy, state), batch, *sargs)
    jax.block_until_ready(sstate)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sstate, info = step(sstate, batch, *sargs)
    jax.block_until_ready(sstate)
    wall_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"# wall {wall_ms:.1f} ms/step (pre-profiler)")

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="roofline_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            sstate, info = step(sstate, batch, *sargs)
        jax.block_until_ready(sstate)

    rows_t = summarize_trace(trace_dir, steps=args.steps, hlo_text=hlo)
    dev = jax.devices()[0]
    peak_fl, peak_by = chip_peak_flops(dev), chip_peak_hbm_bytes(dev)

    # Analytic FLOPs for the Pallas custom-calls at THIS config (the HLO
    # text cannot describe a kernel body).  Native-res field: res/2.
    h = w = res // 2
    N = B * h * w
    K = min(loss_cfg.contrast_capacity or C, C)  # packed class axis
    S = 4  # label slots at 2x upsample
    n_draws = int(0.7 * res * res) * B
    kernel_flops = {
        # fwd: logits matmul (N x D x K); S label-slot compares are VPU
        "ce_fwd": 2.0 * N * D * K,
        # bwd: score recompute + dsamples + dtable matmuls
        "ce_bwd": 6.0 * N * D * K,
        # histogram: one-hot matmul over the draw tiles
        "histogram": 2.0 * n_draws * (S * 128),
    }

    instrs = parse_hlo_instructions(hlo)
    rows = roofline_rows(rows_t, instrs, peak_fl, peak_by, kernel_flops)
    total_ms = sum(r["ms"] for r in rows)

    if args.dump:
        print(f"\n## top {args.dump} instructions "
              "(ms | GB | GFLOP | bound | % own roofline | op)")
        for r in rows[: args.dump]:
            print(f"{r['ms']:8.3f}  {r['gb']:7.3f}  {r['gflop']:8.1f}  "
                  f"{r['bound']:4s}  {100 * r['attainment']:5.0f}%  "
                  f"{r['instr'][:24]:24s}  {r['op'][-70:]}")

    buckets = bucket_rows(rows, BUCKETS)
    print(f"\n## per-interval roofline ({'bf16' if bf16 else 'fp32'} "
          f"{A}x{B} @ {res}^2, C={C}; device total "
          f"{total_ms:.1f} ms/step, wall {wall_ms:.1f} ms)")
    print(format_interval_table(buckets, total_ms))
    print(
        "\nfooter: bytes are analytic minimum operand+result traffic "
        "(fusion re-reads/spills not modeled); Pallas custom-call FLOPs "
        "annotated analytically; attainment = max(flop-time, byte-time) "
        "/ measured time on "
        f"{dev.device_kind} (peaks {peak_fl / 1e12:.0f} TFLOP/s, "
        f"{peak_by / 1e9:.0f} GB/s)."
    )


if __name__ == "__main__":
    main()
