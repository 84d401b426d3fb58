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


# Ordered: first match wins.  The Pallas kernels are identified by their
# position in the jaxpr name stack (custom_vjp strips the function name):
# CE lives under the packed-contrast lax.cond ("/cond/branch_*_fun/
# pallas_call"), the field l2-normalize under the decoder scope, the TV
# kernel is the remaining bare "closed_call/<jvp>/pallas_call".
BUCKETS = [
    ("CE fwd+bwd (Pallas, packed)", r"/cond/branch|branch_\d+_fun"),
    ("l2-normalize field (Pallas)", r"depth_decoder/pallas_call"),
    ("TV fwd+bwd (Pallas)",
     r"closed_call/(?:transpose\(jvp\(\)\)|jvp\(\))/pallas_call"),
    ("histogram/presence/pool (Pallas)",
     r"histogram|class_presence|masked_pooling|pooling"),
    ("encoder convs", r"depth_encoder"),
    ("decoder convs+head", r"depth_decoder"),
    ("pixel draw / RNG", r"random_bits|threefry|iota|sample"),
    ("image-contrast", r"area_image|image_contrast|bhw,bhwd"),
    ("grad-accum adds (XLA add_any)", r"add_any"),
    ("optimizer/adam", r"adam|optax|update_fn|apply_updates"),
]

# Async DMA lifetime markers: each start/done pair re-references buffers
# the owning compute rows already count, and their device time is hidden
# under compute (that's the point of the overlap engine) — a roofline
# attainment is meaningless for them.  Excluded from the table; reported
# as one summary line instead.
ASYNC_RE = __import__("re").compile(
    r"^[\w\-]+-(start|done)[.\d]*$")


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
    # A lax.cond's trace event covers its executed branch, which ALSO
    # appears as its own event — keep the branch (it carries the kernel
    # identity), drop the wrapper so totals don't double-count.
    rows_t = [r for r in rows_t if not r[0].startswith("conditional")]
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
        # histogram: the kernel BRUTE-FORCES the scatter as a one-hot
        # matmul — 2 * bins * total_draws real MXU FLOPs (its docstring's
        # design tradeoff), bins = res^2 full-res pixels.  Keyed to the
        # pallas_call row only (several satellite fusions carry the
        # 'histogram' scope in their op names).
        "fused_histogram))/pallas_call": 2.0 * float(res * res) * n_draws,
    }

    instrs = parse_hlo_instructions(hlo)
    rows = roofline_rows(rows_t, instrs, peak_fl, peak_by, kernel_flops)

    # The CE kernel pair lives under the packed-contrast lax.cond; several
    # OTHER kernels also dispatch under conds, so assign the analytic CE
    # FLOPs to exactly ONE fwd and ONE bwd row: the most expensive branch
    # row of each jvp direction (the CE field traffic dwarfs the rest).
    def _assign_ce(pattern, flops):
        cand = [r for r in rows
                if pattern in r["op"] and "/cond/branch" in r["op"]]
        if not cand:
            return
        r = max(cand, key=lambda r: r["ms"])
        t = r["ms"] / 1e3
        r["gflop"] = flops / 1e9
        r["tflops"] = flops / t / 1e12
        t_fl, t_by = flops / peak_fl, r["gb"] * 1e9 / peak_by
        r["bound"] = "flop" if t_fl >= t_by else "byte"
        r["attainment"] = max(t_fl, t_by) / t

    _assign_ce("transpose(jvp())/cond", 6.0 * N * D * K)   # bwd
    _assign_ce("closed_call/jvp()/cond", 2.0 * N * D * K)  # fwd

    def _is_async(r):
        # -start/-done lifetime markers, plus the runtime's bare async
        # copy custom-calls: zero recorded duration, no op_name.
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
                  f"{r['instr'][:24]:24s}  {r['op'][-70:]}")
        print("\n## top 8 by analytic bytes (sanity: wrappers/copies that "
              "reference whole state inflate this)")
        for r in sorted(rows, key=lambda r: -r["gb"])[:8]:
            print(f"{r['ms']:8.3f}  {r['gb']:7.3f}  "
                  f"{r['instr'][:28]:28s}  {r['op'][-60:]}")
        import re as _re
        others = [r for r in rows if not any(
            _re.search(p, r["op"]) or _re.search(p, r["instr"])
            for _, p in BUCKETS)]
        print("\n## top 12 'other' rows by bytes (candidates for bucket "
              "fixes / wrapper exclusion)")
        for r in sorted(others, key=lambda r: -r["gb"])[:12]:
            print(f"{r['ms']:8.3f}  {r['gb']:7.3f}  "
                  f"{r['instr'][:28]:28s}  {r['op'][-60:]}")

    buckets = bucket_rows(rows, BUCKETS)
    print(f"\n## per-interval roofline ({'bf16' if bf16 else 'fp32'} "
          f"{A}x{B} @ {res}^2, C={C}; device total "
          f"{total_ms:.1f} ms/step, wall {wall_ms:.1f} ms)")
    print(format_interval_table(buckets, total_ms))
    a_ms = sum(r["ms"] for r in async_rows)
    a_gb = sum(r["gb"] for r in async_rows)
    print(f"\nasync DMA markers excluded: {len(async_rows)} rows, "
          f"{a_ms:.2f} ms visible, {a_gb:.1f} GB analytic (overlapped "
          "prefetch re-referencing buffers the compute rows already "
          "count; no roofline applies)")
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
