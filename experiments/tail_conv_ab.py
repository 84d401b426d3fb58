"""Isolated A/B: low-channel decoder-tail convs as-is vs blocked-output
space-to-depth rewrite.

The UNet tail's 3x3 convs emit 32-64 channels — only a quarter/half of the
MXU's 128 output lanes do work.  Rewrite: a stride-2 4x4 conv whose kernel
stacks the 3x3 weights at the 4 output offsets emits [H/2, W/2, 4*C]
(all 128 lanes busy), followed by depth-to-space.  Mathematically exact
(same dots, different output blocking).  Measure both in isolation at the
bench's tail shapes; only integrate if the isolated win is >1.2x.

RESULT (v5e, 2026-08-18): NEGATIVE — do not integrate.
  blocked4x4 vs conv3x3 (bf16, batch 128):
    128^2  96->32: 0.93x      64^2 128->64: 0.87x      64^2 192->64: 0.85x
  The stride-2 conv reads the same bytes but XLA's windowed-dot emitter
  already packs multiple low-channel output pixels per MXU pass, so the
  manual 4x blocking only adds the depth-to-space relayout.
  split-sum vs concat-conv: 0.94x at 128^2 [32|32], 1.21x at 64^2 [64|64]
  — mixed and below the bar; the concat the decoder does is not the cost.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv3_same(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


def conv3_blocked(x, w4):
    # w4: [4, 4, Cin, 4*Cout] built from w: out position p=(py,px) uses
    # w[dy, dx] placed at [py+dy, px+dx]
    B, H, W, Cin = x.shape
    Cout4 = w4.shape[-1]
    Cout = Cout4 // 4
    y = lax.conv_general_dilated(x, w4, (2, 2), [(1, 1), (1, 1)],
                                 dimension_numbers=DN)  # [B, H/2, W/2, 4C]
    y = y.reshape(B, H // 2, W // 2, 2, 2, Cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, Cout)
    return y


def build_w4(w):
    kh, kw, cin, cout = w.shape  # 3,3,cin,cout
    w4 = np.zeros((4, 4, cin, 4 * cout), w.dtype)
    for p, (py, px) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        w4[py:py + 3, px:px + 3, :, p * cout:(p + 1) * cout] = w
    return jnp.asarray(w4)


def bench_one(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{name}: {best * 1e3:.3f} ms", flush=True)
    return best, o


def conv_concat(a, b, w):
    return conv3_same(jnp.concatenate([a, b], axis=-1), w)


def conv_split(a, b, w):
    ca = a.shape[-1]
    return conv3_same(a, w[:, :, :ca, :]) + conv3_same(b, w[:, :, ca:, :])


rng = np.random.default_rng(0)
print("dtype bf16, batch 128", flush=True)
for (H, Cin, Cout) in [(128, 64, 32), (128, 96, 32), (64, 128, 64),
                       (64, 192, 64)]:
    x = jnp.asarray(rng.standard_normal((128, H, H, Cin)), jnp.bfloat16)
    w = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.05
    wb = jnp.asarray(w, jnp.bfloat16)
    w4 = build_w4(w.astype(np.float32)).astype(jnp.bfloat16)
    ta, oa = bench_one(f"  {H}^2 {Cin}->{Cout} conv3x3   ", conv3_same, x, wb)
    tb, ob = bench_one(f"  {H}^2 {Cin}->{Cout} blocked4x4", conv3_blocked, x, w4)
    err = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
    print(f"    speedup {ta / tb:.2f}x, max|diff| {err:.2e}", flush=True)

print("concat-vs-split (decoder skip-concat shapes), batch 128", flush=True)
for (H, Cs, Cx, Cout) in [(128, 32, 32, 32), (64, 64, 64, 64)]:
    a = jnp.asarray(rng.standard_normal((128, H, H, Cs)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((128, H, H, Cx)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, Cs + Cx, Cout)) * 0.05,
                    jnp.bfloat16)
    t1, o1 = bench_one(f"  {H}^2 [{Cs}|{Cx}]->{Cout} concat-conv", conv_concat,
                       a, b, w)
    t2, o2 = bench_one(f"  {H}^2 [{Cs}|{Cx}]->{Cout} split-sum  ", conv_split,
                       a, b, w)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"    split/concat {t1 / t2:.2f}x, max|diff| {err:.2e}", flush=True)
