"""A/B: decoder up-convs — lhs-dilated ConvTranspose(k2,s2) vs an exact
1x1-conv + depth-to-space rewrite.

The decoder's five upsamplers (blocks.py DecoderBlock) are torch
ConvTranspose2d(k=2, s=2, p=0) lowered as Conv(lhs_dilate(x, 2), flip(W))
with padding 1.  With kernel 2 and dilation 2, every 2x2 window over the
dilated input contains exactly ONE nonzero input pixel — if XLA's conv
emitter multiplies the inserted zeros, 75% of the MACs are wasted.  The
exact rewrite: output[2i+py, 2j+px, o] = sum_c x[i,j,c] * W[py,px,c,o]
is a single 1x1 conv to 4F channels (fuller MXU lanes at the tail's
small F, too) followed by a depth-to-space reshape.  Same dots, same
per-output reduction order.

Measures (a) each of the real decoder shapes in isolation, fwd and
fwd+bwd, interleaved rounds in ONE process, and (b) if the summed
isolated win is >1.1x, the REAL 1x32 @ 256^2 bf16 train step with
blocks.conv_transpose_2d monkeypatched (trace-time binding).

Run on the TPU machine:  python experiments/upconv_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rangeclip_tpu.ops.blocks import conv_transpose_2d
from rangeclip_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

# (H, in_ch, out_ch) at microbatch 32 — traced from the real decoder @256^2
SHAPES = [(8, 512, 512), (16, 512, 256), (16, 256, 128), (32, 128, 64),
          (64, 64, 32)]
B = 32
ROUNDS, ITERS = 6, 30


def upconv_dilated(x, w):
    return conv_transpose_2d(x, w, stride=2, padding=0, output_padding=0)


def upconv_d2s(x, w):
    # w: [2, 2, C, F] -> [1, 1, C, 4F] with channel index (py*2+px)*F + o
    C, F = w.shape[2], w.shape[3]
    w1 = w.transpose(2, 0, 1, 3).reshape(1, 1, C, 4 * F)
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h, wd = y.shape[:3]
    y = y.reshape(b, h, wd, 2, 2, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * wd, F)


def bench(fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    total_a = total_b = 0.0
    for H, Cin, F in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, H, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((2, 2, Cin, F)) * 0.05,
                        jnp.bfloat16)

        fa = jax.jit(upconv_dilated)
        fb = jax.jit(upconv_d2s)
        ya, yb = fa(x, w), fb(x, w)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        assert err == 0.0, f"not exact: {err}"

        ca = fa.lower(x, w).compile().cost_analysis().get("flops", 0.0)
        cb = fb.lower(x, w).compile().cost_analysis().get("flops", 0.0)

        def loss_a(x, w):
            return jnp.sum(upconv_dilated(x, w).astype(jnp.float32) ** 2)

        def loss_b(x, w):
            return jnp.sum(upconv_d2s(x, w).astype(jnp.float32) ** 2)

        ga = jax.jit(jax.grad(loss_a, argnums=(0, 1)))
        gb = jax.jit(jax.grad(loss_b, argnums=(0, 1)))

        ta_f, tb_f = bench(fa, x, w), bench(fb, x, w)
        ta_g, tb_g = bench(ga, x, w), bench(gb, x, w)
        total_a += ta_f + ta_g
        total_b += tb_f + tb_g
        print(f"{H:3d}^2 {Cin:3d}->{F:3d}  fwd {ta_f:7.3f} vs {tb_f:7.3f} ms "
              f"({ta_f / tb_f:4.2f}x)   fwd+bwd-ish {ta_g:7.3f} vs "
              f"{tb_g:7.3f} ms ({ta_g / tb_g:4.2f}x)   "
              f"flops {ca / 1e6:.1f} vs {cb / 1e6:.1f} MFLOP")
    print(f"summed: dilated {total_a:.3f} ms vs d2s {total_b:.3f} ms "
          f"({total_a / total_b:4.2f}x)")
    if total_a / total_b <= 1.1:
        print("below the 1.1x integration bar — recording as negative")


if __name__ == "__main__":
    main()
