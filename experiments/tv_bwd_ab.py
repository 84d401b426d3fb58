"""A/B: TV-smoothness backward — materialized sign fields vs one-pass.

The shipped custom VJP (losses/smoothness.py _tv_bwd) computes the two
sign fields sh/sv once each and combines four pads of them.  Because each
sign field feeds TWO pads, XLA materializes both to HBM (the two 2.35 ms
compare_select fusions in the 1x32 step profile) and then re-reads them
in the combine fusion — ~4.8 GB of HBM traffic for a 537 MB gradient.

Candidate: express the gradient directly in shifted reads of x with
boundary masks, so every pad feeds exactly ONE consumer and the whole
backward can fuse into a single elementwise pass (x read with a +-1 halo,
gradient written once — ~1.6 GB ideal):

  dx_h[w] = gh * ( [w<W-1]*slope(x[w] - x[w+1]) - [w>0]*slope(x[w-1] - x[w]) )

and symmetrically for the vertical term.  slope() keeps JAX's
d|u|/du = (u >= 0 ? +1 : -1) convention, so the candidate must be
BIT-IDENTICAL to the shipped backward (checked on device before timing).

Run on the TPU machine:  python experiments/tv_bwd_ab.py

Both variants are timed interleaved in ONE process (best-of rounds) —
the axon tunnel's throughput varies too much for cross-process numbers.
"""

import functools
import time

import jax
import jax.numpy as jnp

B, H, W, D = 32, 128, 128, 512
DTYPE = jnp.bfloat16
ROUNDS, ITERS = 6, 20


def _tv_value(x):
    tv_h = jnp.mean(jnp.abs(x[:, :, :-1, :] - x[:, :, 1:, :]), dtype=jnp.float32)
    tv_v = jnp.mean(jnp.abs(x[:, :-1, :, :] - x[:, 1:, :, :]), dtype=jnp.float32)
    return tv_h + tv_v


def _slope(u):
    one = jnp.asarray(1, u.dtype)
    return jnp.where(u >= 0, one, -one)


def _bwd_signfields(x, g):
    """The shipped formulation (losses/smoothness.py _tv_bwd, upsample=1)."""
    B_, H_, W_, D_ = x.shape
    gh = g / (B_ * H_ * (W_ - 1) * D_)
    gv = g / (B_ * (H_ - 1) * W_ * D_)
    sh = _slope(x[:, :, :-1, :] - x[:, :, 1:, :])
    sv = _slope(x[:, :-1, :, :] - x[:, 1:, :, :])
    no = (0, 0)
    grad = (
        gh * (jnp.pad(sh, (no, no, (0, 1), no))
              - jnp.pad(sh, (no, no, (1, 0), no)))
        + gv * (jnp.pad(sv, (no, (0, 1), no, no))
                - jnp.pad(sv, (no, (1, 0), no, no)))
    )
    return grad.astype(x.dtype)


def _bwd_onepass(x, g):
    """Candidate: masked neighbor slopes, one fused pass."""
    B_, H_, W_, D_ = x.shape
    gh = g / (B_ * H_ * (W_ - 1) * D_)
    gv = g / (B_ * (H_ - 1) * W_ * D_)
    no = (0, 0)
    zero = jnp.asarray(0, x.dtype)
    # x shifted to the element's +1 / -1 neighbor (edge value arbitrary —
    # masked out below); pad(slice(x)) is a lazy reindex XLA fuses.
    x_wp = jnp.pad(x[:, :, 1:, :], (no, no, (0, 1), no))
    x_wm = jnp.pad(x[:, :, :-1, :], (no, no, (1, 0), no))
    x_hp = jnp.pad(x[:, 1:, :, :], (no, (0, 1), no, no))
    x_hm = jnp.pad(x[:, :-1, :, :], (no, (1, 0), no, no))
    wi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W_, 1), 2)
    hi = jax.lax.broadcasted_iota(jnp.int32, (1, H_, 1, 1), 1)
    term_h = (jnp.where(wi < W_ - 1, _slope(x - x_wp), zero)
              - jnp.where(wi > 0, _slope(x_wm - x), zero))
    term_v = (jnp.where(hi < H_ - 1, _slope(x - x_hp), zero)
              - jnp.where(hi > 0, _slope(x_hm - x), zero))
    return (gh * term_h + gv * term_v).astype(x.dtype)


def make_tv(bwd):
    @jax.custom_vjp
    def tv(x):
        return _tv_value(x)

    tv.defvjp(lambda x: (_tv_value(x), x), lambda x, g: (bwd(x, g),))

    # grad through a scalar chain so the timed program is fwd+bwd like the
    # train step's TV term
    return jax.jit(jax.grad(lambda x: tv(x) * 2.0))


def main():
    x = jax.random.normal(jax.random.key(0), (B, H, W, D), jnp.float32)
    x = x.astype(DTYPE)
    f_a = make_tv(_bwd_signfields)
    f_b = make_tv(_bwd_onepass)

    ga = f_a(x)
    gb = f_b(x)
    jax.block_until_ready((ga, gb))
    mismatch = int(jnp.sum(ga != gb))
    print(f"# bit-identical check: {mismatch} mismatching elements")
    assert mismatch == 0

    best = {"signfields": float("inf"), "onepass": float("inf")}
    for r in range(ROUNDS):
        for name, f in (("signfields", f_a), ("onepass", f_b)):
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = f(x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], dt)
        print(f"# round {r}: " + ", ".join(
            f"{k} {v * 1e3:.2f} ms" for k, v in best.items()))
    ratio = best["signfields"] / best["onepass"]
    print(f"VERDICT: onepass is {ratio:.2f}x the signfields formulation "
          f"({best['signfields']*1e3:.2f} -> {best['onepass']*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
