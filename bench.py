"""Throughput benchmark — depth maps/sec/chip at 256x256 segmentation
inference (the BASELINE.json north-star metric).

Measures the full flagship inference path on one chip: ResNet-18 DepthUNet
forward (512-dim CLIP space) + L2 normalize + pixel x text scoring against a
512-class candidate table + top-5 labels at 256^2, i.e. the fused equivalent
of the reference's predict (model.py:119-175).  Scoring runs at the
decoder's native H/2 resolution with the top-k indices nearest-upsampled —
proven exactly equal to full-resolution scoring
(tests/test_model_and_train.py::test_predict_native_scoring_identity).

Default path: the FOLDED head (models/depth_unet.py predict_folded) — the
bias-free output conv is contracted with the normalized candidate table so
the conv scores candidates directly ([B,h,w,384] instead of a [B,h,w,512]
embedding field plus a scoring matmul; identical ranking, proven in tests)
and ops/pallas/score_topk.py selects the labels.  Measured on-device:
head 15.4 -> 9.5 ms at batch 128 (selection 6.1 + folded conv 3.4), ~10%
end-to-end.  BENCH_PREDICT=default times the unfolded predict path
(bf16 near-ties round differently between the two, so their checksums
differ; each is deterministic and cross-round-stable).

The measurement cannot be satisfied without real execution:
  * every iteration's top-k output is folded into a device-side scalar
    checksum, and each timing round ends by fetching that scalar to host —
    the clock stops only after all ITERS programs have produced bytes;
  * checksums must be bit-identical across rounds (same inputs), else fail;
  * the compiled program's FLOPs (XLA ``cost_analysis``) bound the result:
    if the implied FLOP/s exceeds the chip's peak the benchmark aborts
    instead of printing fiction.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator is an engineering estimate of the reference PyTorch predict
on its development GPU (documented in BASELINE.md): fp16 UNet forward at
256^2 is ~21 GFLOP/map; at the 25-35% utilization typical of small-batch
conv stacks on a mid-range training GPU, plus the un-fused predict epilogue
(full-res normalize + einsum + sort-based topk over [B*65536, C] logits in
HBM), that is ~300 maps/s.  Treat vs_baseline as indicative until a measured
GPU baseline lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REF_BASELINE_MAPS_PER_SEC = 300.0

# Throughput sweet spot measured on v5e (default-path sweep: 32 -> 2683,
# 64 -> 3343, 128 -> 3839, 256 -> 3801 maps/s; re-swept after the folded
# head landed: 128 -> 5500, 192 -> 4753, 256 -> 5138 maps/s).  Batching
# amortizes fixed per-dispatch and per-kernel overheads until HBM
# working-set pressure flattens it; 128 stays the sweet spot.
BATCH = int(os.environ.get("BENCH_BATCH", 128))
RES = 256
NUM_CLASSES = 512
TOP_K = 5
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", 30))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 4))

# Peak dense bf16 FLOP/s by TPU generation (public cloud specs); the gate
# uses the most generous plausible figure for unknown kinds.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "TPU v7": 4614e12,
}


def _progress(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _chip_peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return max(_PEAK_BF16.values())


def _arm_watchdog(done_event, secs: float, stage: str):
    """Tunnel outages can HANG a phase indefinitely (observed: 26 min stuck
    in backend init before an UNAVAILABLE surfaced) — an exception-based
    retry never fires.  A daemon thread re-execs the process if ``stage``
    hasn't signalled completion within ``secs``, counting it as a
    transient-backend retry."""
    import threading

    def watch():
        if done_event.wait(secs):
            return
        tries = int(os.environ.get("BENCH_RETRY", "0"))
        if tries >= 5:
            _progress(f"{stage} watchdog: still stuck after {secs:.0f}s and "
                      "retry budget exhausted — giving up")
            os._exit(3)
        _progress(f"{stage} watchdog: stuck for {secs:.0f}s "
                  f"— re-exec (retry {tries + 1}/5)")
        os.environ["BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    threading.Thread(target=watch, daemon=True).start()


def main() -> None:
    import threading

    init_done = threading.Event()
    _arm_watchdog(
        init_done, float(os.environ.get("BENCH_WATCHDOG_SECS", 900)), "init")

    import jax
    import jax.numpy as jnp

    from rangeclip_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from rangeclip_tpu.models.depth_unet import (
        DepthUNet,
        DepthUNetConfig,
        build_candidate_indices,
        predict_folded,
    )

    folded = os.environ.get("BENCH_PREDICT", "folded") == "folded"

    cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
    model = DepthUNet(cfg)

    # Distinct input buffers are cycled during timing so the measurement can
    # never be satisfied by any caching layer between here and the chip.
    depths = [
        jax.random.normal(jax.random.key(100 + i), (BATCH, RES, RES, 1),
                          jnp.float32)
        for i in range(8)
    ]
    depth = depths[0]
    # jit the init: eager init dispatches hundreds of tiny ops individually
    # (minutes over a remote-tunnel backend); compiled it is one program.
    variables = jax.jit(lambda k, d: model.init(k, d, train=False))(
        jax.random.key(1), depth
    )
    jax.block_until_ready(variables)
    _progress("init done")
    text = jax.random.normal(jax.random.key(2), (NUM_CLASSES, 512), jnp.float32)
    seg = jax.random.randint(jax.random.key(3), (BATCH, RES, RES), 0, 40)
    # Gathered reduced-candidate form (the reference's own predict
    # formulation, model.py:147-161): the same draw as the [C] mask, as a
    # fixed-capacity ascending index list — scoring runs over 384 slots
    # instead of all 512 classes with bit-identical labels (and therefore
    # a bit-identical checksum; capacity 384 = 40-label GT bound + 300
    # negatives, rounded up to a lane multiple).
    cand = build_candidate_indices(jax.random.key(4), seg, NUM_CLASSES, 300,
                                   capacity=384)

    @jax.jit
    def predict(variables, depth, text, cand):
        if folded:
            topk = predict_folded(model, variables, depth, text, top_k=TOP_K,
                                  candidate_indices=cand)
        else:
            topk, _, _ = model.apply(
                variables, depth, text, None, TOP_K,
                method=DepthUNet.predict, return_embeddings=False,
                candidate_indices=cand,
            )
        # Scalar checksum over the full [B, H, W, k] label field: fetching it
        # forces every upstream program to have really executed.  The 1-D
        # view keeps the reduction off the (8,128)-padded [N, 5] layout
        # (which costs ~1.2 ms/call, ~8% of the whole pipeline).
        return jnp.sum(topk.reshape(-1).astype(jnp.float32))

    # One timing round = ONE dispatch executing ITERS predicts in a
    # device-side scan over the cycled input buffers.  The axon tunnel
    # inserts multi-ms per-dispatch gaps that vary ~5x between processes
    # (round-5 measurement: 18.9 ms device vs 22-60 ms wall per call
    # depending on the day) — scanning on-device measures the chip, not
    # the tunnel, while keeping every integrity property: all ITERS
    # batches really execute (the checksum chain depends on each), the
    # clock covers dispatch + execution + the final 4-byte fetch, and the
    # FLOP-sanity gate bounds the whole scanned program.
    depths_stacked = jnp.stack(depths)

    @jax.jit
    def predict_round(variables, depths_stacked, text, cand):
        def body(acc, i):
            d = jax.lax.dynamic_index_in_dim(
                depths_stacked, i % depths_stacked.shape[0], keepdims=False)
            return acc + predict(variables, d, text, cand), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    compiled_one = predict.lower(variables, depth, text, cand).compile()
    compiled = predict_round.lower(
        variables, depths_stacked, text, cand).compile()
    init_done.set()  # init watchdog covers backend init + model init + compile
    # FLOP accounting comes from the SINGLE-call program: XLA's
    # cost_analysis counts a scan body once, not trip-count times, so the
    # scanned program's figure would understate executed FLOPs 30x and
    # neuter the peak-FLOP integrity gate.
    flops_per_call = float(compiled_one.cost_analysis().get("flops", 0.0))
    peak = _chip_peak_flops(jax.devices()[0])
    _progress(
        f"predict compiled: {flops_per_call / 1e9:.1f} GFLOP/call "
        f"({flops_per_call / BATCH / 1e9:.2f} GFLOP/map), "
        f"chip peak {peak / 1e12:.0f} TFLOP/s"
    )

    # measurement phase gets its own hang watchdog (compiles are done; the
    # default 4 rounds x 30 iters plus warmup normally finish in well under
    # a minute — 20 min means the tunnel died mid-run).  The default scales
    # with the configured work so an honest oversized BENCH_ROUNDS/ITERS/
    # BATCH run is never killed as "stuck".
    measure_done = threading.Event()
    measure_secs = float(os.environ.get(
        "BENCH_MEASURE_WATCHDOG_SECS",
        1200.0 * max(1.0, (ROUNDS * ITERS * BATCH) / (4 * 30 * 128))))
    _arm_watchdog(measure_done, measure_secs, "measure")

    chk0 = float(jax.device_get(predict_round(variables, depths_stacked,
                                              text, cand)))
    if not (chk0 == chk0):  # NaN guard
        raise SystemExit("benchmark checksum is NaN — model output is garbage")
    for _ in range(1, WARMUP):
        float(jax.device_get(predict_round(variables, depths_stacked, text,
                                           cand)))

    # Several timing rounds, best-of: the shared-TPU tunnel shows transient
    # contention that can depress a single measurement.  Each round is one
    # scanned program; the clock stops once its scalar checksum has
    # crossed to the host (a 4-byte fetch — block_until_ready does not
    # reliably synchronize through the tunnel).
    best_dt = float("inf")
    checksums = []
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        total = float(jax.device_get(predict_round(variables, depths_stacked,
                                                   text, cand)))
        dt = time.perf_counter() - t0
        checksums.append(total)
        best_dt = min(best_dt, dt)
        _progress(f"round {r}: {BATCH * ITERS / dt:.0f} maps/s, checksum {total:.0f}")

    measure_done.set()
    if len(set(checksums)) != 1:
        raise SystemExit(f"non-deterministic checksums across rounds: {checksums}")

    maps_per_sec = BATCH * ITERS / best_dt
    implied_flops = flops_per_call * ITERS / best_dt
    if implied_flops > peak:
        raise SystemExit(
            f"implied {implied_flops / 1e12:.0f} TFLOP/s exceeds chip peak "
            f"{peak / 1e12:.0f} TFLOP/s — the measurement did not capture "
            "real execution; refusing to report it"
        )
    _progress(
        f"best: {maps_per_sec:.0f} maps/s, implied {implied_flops / 1e12:.2f} "
        f"TFLOP/s ({100 * implied_flops / peak:.1f}% of peak)"
    )

    print(
        json.dumps(
            {
                "metric": "depth maps/sec/chip @ 256^2 seg inference (fwd+score+top5)",
                "value": round(maps_per_sec, 2),
                "unit": "maps/s",
                "vs_baseline": round(maps_per_sec / REF_BASELINE_MAPS_PER_SEC, 3),
                # the denominator is an ESTIMATED reference-GPU figure
                # (BASELINE.md derivation; no GPU exists here to measure) —
                # carry this caveat wherever vs_baseline is quoted
                "baseline_note": "denominator 300 maps/s is an estimated "
                                 "reference-GPU figure (BASELINE.md)",
            }
        )
    )


def _is_transient_backend_error(exc: BaseException) -> bool:
    """The tunneled TPU backend has outage windows (CLAUDE.md): init fails
    with UNAVAILABLE or times out.  Those are retryable; measurement-
    integrity failures (checksum mismatch, peak-FLOP gate) are not."""
    msg = str(exc)
    return any(s in msg for s in (
        "UNAVAILABLE", "Unable to initialize backend",
        "DEADLINE_EXCEEDED", "failed to connect", "Socket closed",
    ))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as exc:  # noqa: BLE001 — classify, then re-raise
        tries = int(os.environ.get("BENCH_RETRY", "0"))
        if not _is_transient_backend_error(exc) or tries >= 5:
            raise
        _progress(f"transient backend failure (retry {tries + 1}/5 in 90 s): "
                  f"{type(exc).__name__}: {exc}")
        time.sleep(90)
        os.environ["BENCH_RETRY"] = str(tries + 1)
        # re-exec: jax caches a failed backend for the process lifetime.
        os.execv(sys.executable, [sys.executable] + sys.argv)
