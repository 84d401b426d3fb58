"""One-pass row-tile Pallas TV smoothness — forward partial sums and a
single-sweep backward over flat [rt*W, D] row tiles.

Reference semantics: model.py:329-334 (mean L1 of horizontal + vertical
neighbor differences of the pixel-embedding field); the shipped XLA
formulation and its hand-derived sign-field VJP live in
losses/smoothness.py.  This kernel targets the measured gap between that
formulation and the HBM roofline: the 32x128^2x512 bf16 step spends
~10 ms in TV fwd+bwd fusions while one read of the field is ~0.7 ms —
XLA runs the forward as two shifted-read reduce fusions and the backward
as sign-field materializations plus shifted combines (~5 field passes
total).  Here:

  * forward: one read of each [rt*W, D] tile + a one-image-row halo;
    both direction sums accumulate in f32 in VMEM; per-tile partials
    land in a [tiles, 2] SMEM output and are reduced outside.
  * backward: one read of each tile + two one-image-row halos, signs
    recomputed in-register (same residual policy as the XLA VJP: x
    only), gradient written once.  ~1 read + 1 write of the field vs
    XLA's ~5 passes.

Design notes (why THIS shape, after two measured negatives):
  * ops/pallas/tv_loss.py (kept, opt-in) lost to XLA with a 2-D grid of
    small DMA-bound blocks and adjoint re-reads at seams.  The fix is
    the pixel_text_ce/l2_normalize row-tile pattern: a 1-D grid of the
    largest flat [rows, D] tiles that fit VMEM (per-grid-step overhead
    is real), every op on clean 2-D layouts.
  * The field is viewed as [B*H*W, D] rows (leading-dim merge is free).
    A tile is rt whole image rows with rt DIVIDING H, so a tile never
    straddles an image: horizontal pairs are in-tile (the row-end pair
    is masked by a [rows, 1] iota), vertical pairs are an in-tile
    W-row shift plus ONE halo image-row fetched as a second BlockSpec
    view of the same operand, and the image-boundary mask is iota
    arithmetic.
  * experiments/tv_bwd_ab.py showed a one-pass XLA backward is 25%
    SLOWER than sign fields (XLA materializes four masked slope
    fields); the kernel sidesteps the scheduler: signs never leave
    VMEM.
  * 0/1 sample weights fold in as a per-tile scalar (tiles are
    single-image), so the weighted path costs ZERO extra field passes,
    where the XLA path materializes x * w.

Semantics match losses/smoothness.py exactly: differences and signs in
the INPUT dtype (±1 exact in bf16), |.| summed in f32, the d|u|/du = +1
at-ties convention, and the same upsample pair-count rescale.
Divergences from the XLA values, both benign: the forward value differs
by f32 partial-sum order (~1e-5 rel), and ON HARDWARE the backward
differs from the XLA VJP by at most ONE bf16 ulp per element — the
arithmetic is exact up to the final f32->bf16 cast, and Mosaic's truncf
rounds that cast differently from XLA's fused convert (measured at the
canonical train shape: 20% of elements one ulp apart, max|d| = 1 ulp of
the max grad; interpret mode is BIT-equal, tests/test_pallas_kernels).
Dispatched from losses/smoothness.py under ``use_tpu_kernels()`` for
bf16 fields; fp32 (the bit-parity mode vs the torch reference) keeps
XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x-tile byte budgets (pre-double-buffering).  Mosaic stacks the
# whole-tile intermediates, so the budgets are MEASURED on v5e, not
# estimated: forward at a 4 MB tile = 24.37 MB scoped VMEM (rejected),
# 2 MB compiles and runs; backward at 2 MB = 17.00 MB (rejected by
# 1 MB — the f32 slope selects add two tile-sized f32 temporaries),
# 1 MB fits.
_FWD_TILE_BYTES = 2 * 1024 * 1024
_BWD_TILE_BYTES = 1 * 1024 * 1024


def _pick_rt(H: int, W: int, D: int, esize: int, budget: int) -> int:
    from rangeclip_tpu.ops.pallas.tiling import largest_divisor_tile

    return largest_divisor_tile(H, W * D * esize, budget)


def kernel_applicable(shape, dtype) -> bool:
    """Gate for losses/smoothness.py: bf16 4-D fields with lane/sublane-
    divisible minor dims, at least one pair in each direction, and a
    single image row inside the (tighter, backward) tile budget — an
    oversized row would force an over-VMEM rt=1 tile; XLA handles it."""
    if len(shape) != 4:
        return False
    B, H, W, D = shape
    esize = jnp.dtype(dtype).itemsize
    return (
        dtype == jnp.bfloat16
        and H >= 2 and W >= 2
        and W % 8 == 0 and D % 128 == 0
        and W * D * esize <= _BWD_TILE_BYTES
    )


def _fwd_kernel(x_ref, halo_ref, w_ref, sums_ref, *, H: int, W: int,
                rt: int):
    i = pl.program_id(0)
    x = x_ref[...]        # [rt*W, D], input dtype
    halo = halo_ref[...]  # [W, D] first image-row of the next tile
    wt = w_ref[i, 0]      # per-tile 0/1 weight (tiles are single-image)

    local = jax.lax.broadcasted_iota(jnp.int32, (rt * W - 1, 1), 0)
    # horizontal pair (q, q+1) is real unless q ends an image row.  The
    # mask multiply stays in the input dtype (|dh| * {0,1} is exact) so
    # no tile-sized f32 intermediate ever materializes in VMEM; only the
    # reductions accumulate in f32.
    vh = ((local % W) != (W - 1)).astype(x.dtype)
    dh = x[:-1, :] - x[1:, :]
    s_h = jnp.sum(jnp.abs(dh) * vh, dtype=jnp.float32)

    # vertical pair (q, q+W): in-tile shift; all pairs are in-image
    # because rt | H, except the tile's LAST image row, whose pairs use
    # the halo and are masked when the tile ends its image:
    # global image-row r = (i+1)*rt - 1 pairs downward iff r % H != H-1
    # <=> (i+1)*rt % H != 0.
    dv = x[:-W, :] - x[W:, :]
    s_v = jnp.sum(jnp.abs(dv), dtype=jnp.float32)
    dvh = x[-W:, :] - halo
    valid = (((i + 1) * rt) % H != 0).astype(jnp.float32)
    s_v = s_v + valid * jnp.sum(jnp.abs(dvh), dtype=jnp.float32)

    sums_ref[i, 0] = s_h * wt
    sums_ref[i, 1] = s_v * wt


def _bwd_kernel(x_ref, up_ref, dn_ref, w_ref, g_ref, dx_ref, *, H: int,
                W: int, rt: int):
    i = pl.program_id(0)
    x = x_ref[...]      # [rt*W, D], input dtype
    up = up_ref[...]    # [W, D] image-row above the tile (clamped at 0)
    dn = dn_ref[...]    # [W, D] image-row below the tile (clamped)
    wt = w_ref[i, 0]
    gh = g_ref[0, 0] * wt  # f32 scalars: upstream grad / pair counts
    gv = g_ref[0, 1] * wt

    TR = rt * W

    def slope(u):
        # JAX's d|u|/du convention (+1 at exact ties), returned in the
        # input dtype (±1 is exact in bf16).  Compare AND select run in
        # f32, then the result is cast down: Mosaic rejects sub-f32 cmpf
        # outright ("Target does not support this comparison") and also
        # cannot relayout an f32-laid-out i1 mask into a bf16-wide
        # select ("Invalid relayout ... (8,128) -> (16,128)") — both hit
        # on-chip; bf16->f32 widening is exact so the predicate is
        # unchanged, and a truncf cast of ±1.0 is exact.
        uf = u.astype(jnp.float32)
        return jnp.where(uf >= 0, jnp.float32(1), jnp.float32(-1)
                         ).astype(x.dtype)

    local = jax.lax.broadcasted_iota(jnp.int32, (TR - 1, 1), 0)
    vh = ((local % W) != (W - 1)).astype(x.dtype)
    sh = slope(x[:-1, :] - x[1:, :]) * vh  # [TR-1, D], exact in bf16
    zrow = jnp.zeros((1, x.shape[-1]), x.dtype)
    # dx_h[q] = gh * (sh(q) - sh(q-1)) with masked pads; the pad
    # difference stays in the input dtype ({-2..2} is exact in bf16, and
    # this is precisely the XLA VJP's promotion order: bf16 difference,
    # THEN the f32-scalar multiply) — no tile-sized f32 intermediates
    d_h = (jnp.concatenate([sh, zrow], axis=0)
           - jnp.concatenate([zrow, sh], axis=0))

    # vertical: ext pair j covers (i*TR - W + j, i*TR + j); its image-row
    # is i*rt - 1 + j // W, masked outside [0, ...] and at image ends
    top = jnp.concatenate([up, x], axis=0)  # [TR+W, D]
    bot = jnp.concatenate([x, dn], axis=0)
    ext = jax.lax.broadcasted_iota(jnp.int32, (TR + W, 1), 0)
    rp = i * rt - 1 + ext // W
    vv = ((rp >= 0) & (rp % H != H - 1)).astype(x.dtype)
    sv = slope(top - bot) * vv             # [TR+W, D], exact in bf16
    # dx_v[q] = gv * (sv_ext(q+W) - sv_ext(q))
    d_v = sv[W:, :] - sv[:-W, :]

    dx_ref[...] = (gh * d_h + gv * d_v).astype(dx_ref.dtype)


def _scale_sums(s_h, s_v, shape, upsample):
    B, H, W, D = shape
    tv_h = s_h / (B * H * (W - 1) * D)
    tv_v = s_v / (B * (H - 1) * W * D)
    if upsample > 1:
        tv_h = tv_h * ((W - 1) / (upsample * W - 1))
        tv_v = tv_v * ((H - 1) / (upsample * H - 1))
    return tv_h + tv_v


def _tile_weight(sample_weight, B, tiles_per_image):
    if sample_weight is None:
        w = jnp.ones((B,), jnp.float32)
    else:
        w = sample_weight.astype(jnp.float32)
    return jnp.repeat(w, tiles_per_image).reshape(-1, 1)


def _tv_sums(x, sample_weight, interpret):
    B, H, W, D = x.shape
    esize = jnp.dtype(x.dtype).itemsize
    rt = _pick_rt(H, W, D, esize, _FWD_TILE_BYTES)
    tiles = (B * H) // rt
    xf = x.reshape(B * H * W, D)
    wt = _tile_weight(sample_weight, B, H // rt)
    n_wblocks = B * H  # (W, D) halo blocks along the row axis

    sums = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, rt=rt),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((rt * W, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (W, D),
                lambda i: (jnp.minimum((i + 1) * rt, n_wblocks - 1), 0),
                memory_space=pltpu.VMEM),
            # per-tile scalars live UNBLOCKED in SMEM, indexed by the
            # program id — a blocked (1, 1)/(1, 2) SMEM spec violates
            # Mosaic's (8, 128)-or-equal block rule and fails TPU
            # lowering (caught by tests/test_tpu_lowering.py)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, 2), jnp.float32),
        interpret=interpret,
    )(xf, xf, wt)
    return jnp.sum(sums[:, 0]), jnp.sum(sums[:, 1])


def _tv_bwd_impl(upsample, interpret, x, sample_weight, g):
    B, H, W, D = x.shape
    s = upsample
    gh = g / (B * H * (W - 1) * D)
    gv = g / (B * (H - 1) * W * D)
    if s > 1:
        gh = gh * ((W - 1) / (s * W - 1))
        gv = gv * ((H - 1) / (s * H - 1))
    gs = jnp.stack([gh, gv]).astype(jnp.float32).reshape(1, 2)

    esize = jnp.dtype(x.dtype).itemsize
    rt = _pick_rt(H, W, D, esize, _BWD_TILE_BYTES)
    tiles = (B * H) // rt
    xf = x.reshape(B * H * W, D)
    wt = _tile_weight(sample_weight, B, H // rt)
    n_wblocks = B * H

    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, rt=rt),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((rt * W, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (W, D),
                # the image-row ABOVE the tile; clamped at 0, where the
                # rp >= 0 mask kills the clamped read's contribution
                lambda i: (jnp.maximum(i * rt - 1, 0), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (W, D),
                lambda i: (jnp.minimum((i + 1) * rt, n_wblocks - 1), 0),
                memory_space=pltpu.VMEM),
            # unblocked SMEM (see the forward's note)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rt * W, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H * W, D), x.dtype),
        interpret=interpret,
    )(xf, xf, xf, wt, gs)
    return dx.reshape(B, H, W, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tv_rowtile(x: jax.Array, sample_weight, upsample: int = 1,
               interpret: bool = False) -> jax.Array:
    """TV smoothness of the (0/1-sample-weighted) field via the row-tile
    kernel.  x: [B, H, W, D]; sample_weight: [B] 0/1 or None (weights are
    NOT differentiated — they are the sample_valid mask, and the weighted
    value here is TV(x * w) WITHOUT the B/sum(w) rescale, which the
    caller applies).  Returns the same value as losses/smoothness.py's
    ``_tv(x * w, upsample)`` up to f32 partial-sum order."""
    s_h, s_v = _tv_sums(x, sample_weight, interpret)
    return _scale_sums(s_h, s_v, x.shape, upsample)


def _tv_fwd_vjp(x, sample_weight, upsample, interpret):
    s_h, s_v = _tv_sums(x, sample_weight, interpret)
    return _scale_sums(s_h, s_v, x.shape, upsample), (x, sample_weight)


def _tv_bwd_vjp(upsample, interpret, res, g):
    x, sample_weight = res
    return (_tv_bwd_impl(upsample, interpret, x, sample_weight, g), None)


tv_rowtile.defvjp(_tv_fwd_vjp, _tv_bwd_vjp)
