"""In-process A/B: CE-kernel MXU operand dtype (f32 vs bf16) on the chip.

1) standalone fused CE fwd+bwd at the canonical native-res train shape
2) full train step (1x32 @ 256^2 bf16) with each CE variant

Interleaved rounds, best-of — tunnel throughput varies between processes.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

B, H, W, D, C, S = 32, 128, 128, 512, 512, 4
rng = np.random.default_rng(0)
samples = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.bfloat16)
labels = jnp.asarray(rng.integers(1, C, (S, B * H * W)), jnp.int32)
valid = jnp.asarray(rng.random((S, B * H * W)) > 0.2, jnp.float32)
text_n = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
text_n = text_n / jnp.linalg.norm(text_n, axis=-1, keepdims=True)
mask = jnp.asarray(np.arange(C) < 300)


def build(tag):
    os.environ["RANGECLIP_CE_MATMUL"] = tag

    @jax.jit
    def f(s, t):
        def loss(s, t):
            return fused_pixel_text_ce(s, t, labels, valid, text_n, mask)
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(s, t)
        return v, jnp.sum(g[0].astype(jnp.float32) ** 2), g[1]

    out = f(samples, jnp.float32(0.07))  # trace under this env
    jax.block_until_ready(out)
    return f, out


f32_fn, f32_out = build("f32")
print("f32 value/gnorm/dtau:", [float(x) for x in f32_out], flush=True)
bf16_fn, bf16_out = build("bf16")
print("bf16 value/gnorm/dtau:", [float(x) for x in bf16_out], flush=True)

t = jnp.float32(0.07)
best = {"f32": float("inf"), "bf16": float("inf")}
for r in range(4):
    for tag, fn in (("f32", f32_fn), ("bf16", bf16_fn)):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(samples, t)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        best[tag] = min(best[tag], dt)
        print(f"round {r} {tag}: {dt * 1e3:.2f} ms", flush=True)
print("BEST standalone CE fwd+bwd:",
      {k: f"{v * 1e3:.2f} ms" for k, v in best.items()}, flush=True)

# ---- row-tile sweep under bf16 operands ----------------------------------
os.environ["RANGECLIP_CE_MATMUL"] = "bf16"
for fwd_rows, bwd_rows in (("8", "2"), ("16", "2"), ("8", "4"), ("16", "4")):
    os.environ["RANGECLIP_CE_ROWS_FWD"] = fwd_rows
    os.environ["RANGECLIP_CE_ROWS_BWD"] = bwd_rows

    @jax.jit
    def g(s, t):
        def loss(s, t):
            return fused_pixel_text_ce(s, t, labels, valid, text_n, mask)
        v, gr = jax.value_and_grad(loss, argnums=(0, 1))(s, t)
        return v, jnp.sum(gr[0].astype(jnp.float32) ** 2), gr[1]

    try:
        out = g(samples, jnp.float32(0.07))
        jax.block_until_ready(out)
    except Exception as e:
        print(f"rows fwd={fwd_rows} bwd={bwd_rows}: FAILED {type(e).__name__}",
              flush=True)
        continue
    bt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(samples, jnp.float32(0.07))
        jax.block_until_ready(out)
        bt = min(bt, (time.perf_counter() - t0) / 10)
    print(f"rows fwd={fwd_rows} bwd={bwd_rows}: {bt * 1e3:.2f} ms", flush=True)
for k in ("RANGECLIP_CE_ROWS_FWD", "RANGECLIP_CE_ROWS_BWD"):
    os.environ.pop(k, None)

# ---- full train step A/B -------------------------------------------------
from rangeclip_tpu.losses.hybrid import HybridLossConfig
from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
from rangeclip_tpu.training.optim import make_optimizer
from rangeclip_tpu.training.state import create_train_state
from rangeclip_tpu.training.train_step import make_train_step

res, A, MB = 256, 1, 32
cfg = DepthUNetConfig(use_batch_norm=True, dtype=jnp.bfloat16)
model = DepthUNet(cfg)
opt = make_optimizer(1e-4)
text = jax.random.normal(jax.random.key(1), (C, D))
med = jnp.zeros((C, C), bool)
rngnp = np.random.default_rng(0)
batch = {
    "depth": rngnp.standard_normal((A, MB, res, res, 1)).astype(np.float32),
    "segmentation": rngnp.integers(0, 40, (A, MB, res, res)).astype(np.int32),
    "object_label": np.ones((A, MB), np.int32),
    "image_embeddings": rngnp.standard_normal((A, MB, D)).astype(np.float32),
    "sample_valid": np.ones((A, MB), np.float32),
}

steps = {}
for tag in ("f32", "bf16"):
    os.environ["RANGECLIP_CE_MATMUL"] = tag
    state = create_train_state(jax.random.key(0), cfg, opt, (MB, res, res, 1))
    step = make_train_step(model, opt, HybridLossConfig(), accum_steps=A)

    def run(s, step=step):
        return step(s, batch, jax.random.key(5), jnp.float32(1e-4),
                    jnp.float32(0.25), jnp.float32(0.5), text, med, med)

    s, info = run(jax.tree.map(jnp.copy, state))
    jax.block_until_ready(s)
    print(f"train[{tag}] loss:", float(info["total_loss"]), flush=True)
    steps[tag] = (run, s)

bests = {"f32": float("inf"), "bf16": float("inf")}
for r in range(4):
    for tag in ("f32", "bf16"):
        run, s = steps[tag]
        t0 = time.perf_counter()
        for _ in range(5):
            s, info = run(s)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / 5
        steps[tag] = (run, s)
        bests[tag] = min(bests[tag], dt)
        print(f"train round {r} {tag}: {dt * 1e3:.1f} ms/step", flush=True)
print("BEST train step:", {k: f"{v * 1e3:.1f} ms" for k, v in bests.items()},
      flush=True)
