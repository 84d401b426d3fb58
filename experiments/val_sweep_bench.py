"""Full-validation-sweep throughput at the bench config (VERDICT r4 #6,
BASELINE.json config #2).

Two measurements, printed as README rows:

1. ON-CHIP: `evals/validate.py::validate_model` end-to-end over a
   synthetic 256^2 / C=512 validation set — the real loop: host batch
   prep + CLIP crop embedding + jitted val step (hybrid val loss,
   reduced-candidate predict with GT+50 negatives, equivalence-aware
   metric accumulation) — reported as maps/s.
2. CPU metric-stack contrast: the reference's per-label Python metric
   loop (validate.py:95-139, via the test-suite oracle transcription)
   vs the vectorized segment-sum metrics on identical [B, H, W, 5]
   predictions — the "big TPU win for the val loop" claim
   (evals/metrics.py:11-15), finally with a number on it.

Usage (TPU machine):  python experiments/val_sweep_bench.py [--n 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128, help="val maps")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--classes", type=int, default=512)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from rangeclip_tpu.data.synthetic import SyntheticDepthSegDataset
    from rangeclip_tpu.evals.validate import validate_model
    from rangeclip_tpu.losses.hybrid import HybridLossConfig
    from rangeclip_tpu.models.clip.provider import (
        HashImageEmbedder,
        HashTextEmbedder,
    )
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig

    C, res, B = args.classes, args.res, args.batch
    ds = SyntheticDepthSegDataset(
        n_samples=args.n, resize_shape=(res, res), num_classes=C, seed=3,
        n_regions=10,
    )

    # Pre-generate the scene batches ONCE: synthetic generation is
    # host-side numpy on this machine's single core (~60 ms/map) and
    # would otherwise dominate the sweep — a real deployment reads
    # decoded PNGs through the process-pool loader instead.
    cached = []
    for start in range(0, args.n, B):
        items = [ds[i] for i in range(start, min(start + B, args.n))]
        if len(items) < B:
            break
        cached.append({
            k: np.stack([it[k] for it in items])
            for k in ("depth", "image", "segmentation", "object_bbox",
                      "object_label")
        } | {"sample_valid": np.ones((B,), np.float32)})

    def batches():
        return iter(cached)

    cfg = DepthUNetConfig(
        use_batch_norm=True,
        dtype=None if args.fp32 else jnp.bfloat16,
    )
    model = DepthUNet(cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((B, res, res, 1), jnp.float32), train=False))(
        jax.random.key(0))
    jax.block_until_ready(variables)
    print("# init done", file=sys.stderr, flush=True)

    text = jnp.asarray(HashTextEmbedder(512)(ds.get_candidate_labels()))
    med = jnp.zeros((C, C), bool)
    equiv = jnp.asarray(np.eye(C, dtype=bool))
    cmap = jnp.arange(C, dtype=jnp.int32)
    image_provider = HashImageEmbedder(512)
    curriculum = {"pct_medium": 0.0, "pct_hard": 0.0}

    def sweep():
        return validate_model(
            model, variables["params"], variables["batch_stats"], batches(),
            text, med, med, equiv, cmap, curriculum, image_provider,
            step=0, best_results={"step": -1, "loss": float("inf")},
            rng=jax.random.key(9), loss_config=HybridLossConfig(),
            top_k=5, num_negatives=50,
        )

    t0 = time.perf_counter()
    sweep()  # includes compiles
    t_cold = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res_d = sweep()
        dt = time.perf_counter() - t0
        best = min(best or dt, dt)
    n_maps = (args.n // B) * B
    print(f"\n## full val sweep ({'fp32' if args.fp32 else 'bf16'} "
          f"batch {B} @ {res}^2, C={C}, GT+50 negatives, top-5, "
          f"loss recompute + equivalence metrics)")
    print(f"cold (with compiles): {n_maps / t_cold:.1f} maps/s; "
          f"warm best-of-3: {n_maps / best:.1f} maps/s "
          f"({best / n_maps * 1e3:.2f} ms/map)")
    print(f"final metrics: { {k: round(float(v), 4) for k, v in res_d.items() if k != 'step'} }")

    # --- CPU metric-stack contrast (reference python loop vs vectorized)
    from tests.test_metrics import _oracle
    from rangeclip_tpu.evals.metrics import (
        metrics_finalize, metrics_init, metrics_update,
    )

    rng = np.random.default_rng(0)
    pred = rng.integers(1, C, (B, res, res, 5)).astype(np.int32)
    gt = rng.integers(1, C, (B, res, res)).astype(np.int32)
    equiv_np, cmap_np = np.eye(C, dtype=bool), np.arange(C)

    t0 = time.perf_counter()
    _oracle(pred, gt, equiv_np, cmap_np)
    t_ref = time.perf_counter() - t0

    # device-resident inputs + scalar fetch: exclude the host->device
    # transfer and the unreliable block_until_ready from the timing
    pred_d, gt_d = jnp.asarray(pred), jnp.asarray(gt)
    eq_d, cm_d = jnp.asarray(equiv_np), jnp.asarray(cmap_np)

    @jax.jit
    def vec(pred, gt):
        acc = metrics_update(metrics_init(C), pred, gt, eq_d, cm_d)
        return acc["correct_top1"] + acc["total_pixels"]

    float(jax.device_get(vec(pred_d, gt_d)))  # compile
    t_vec = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(jax.device_get(vec(pred_d, gt_d)))
        t_vec = min(t_vec, time.perf_counter() - t0)
    print(f"\n## metric stack alone, one {B}x{res}^2 batch, C={C} (CPU "
          "host for the reference loop; vectorized runs wherever jax is)")
    print(f"reference per-label python loop (validate.py:95-139 "
          f"transcription): {t_ref * 1e3:.0f} ms ({t_ref / B * 1e3:.1f} "
          f"ms/map)")
    print(f"vectorized segment-sum metrics (evals/metrics.py): "
          f"{t_vec * 1e3:.1f} ms ({t_vec / B * 1e3:.2f} ms/map) — "
          f"{t_ref / t_vec:.0f}x")


if __name__ == "__main__":
    main()
