"""TPU (Mosaic) lowering regression tests for every Pallas kernel.

Interpret-mode parity tests exercise kernel SEMANTICS but skip the Mosaic
lowering pipeline entirely, so a kernel can pass its parity test and still
fail to compile on hardware — both failure modes have been hit on-chip:

  * "Unimplemented primitive in Pallas TPU lowering ...: dynamic_slice"
    (score_topk's packed selector chunk loop, a traced fori_loop index
    slicing a VALUE);
  * "Invalid relayout ..." (sublane-replicated [1, S] ids in a where,
    score_topk docstring).

``jax.export.export(..., platforms=("tpu",))`` runs that lowering pipeline
(jaxpr -> Mosaic MLIR, including the Mosaic pass pipeline) on any host, no
TPU needed — the same cross-platform lowering cli/export.py ships.  These
tests export every kernel wrapper (forward, and backward where a custom
VJP exists) at small shapes that satisfy each kernel's applicability
gates, so an unlowerable kernel fails CI instead of the bench/serve path
on hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jax_export


def _export_tpu(fn, *args):
    """Lower ``fn(*args)`` for the TPU platform (no execution)."""
    return jax_export.export(jax.jit(fn), platforms=("tpu",))(
        *jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    )


def _grad_sum(fn, argnums=0):
    def wrapped(*args):
        return jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)),
                        argnums=argnums)(*args)
    return wrapped


B, H, W, D, C = 2, 16, 16, 128, 128


def test_score_topk_packed_lowers():
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    field = jnp.zeros((H, W, 8, C), jnp.bfloat16)  # [h, w, B, S]
    fn = functools.partial(fused_score_topk.__wrapped__, top_k=5,
                           want_values=True, selector="packed")
    _export_tpu(fn, field)


def test_score_topk_knockout_lowers():
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    field = jnp.zeros((H, W, 8, C), jnp.float32)
    fn = functools.partial(fused_score_topk.__wrapped__, top_k=5,
                           want_values=True, selector="knockout")
    _export_tpu(fn, field)


def test_score_topk_gathered_ids_lower():
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    field = jnp.zeros((H, W, 8, C), jnp.bfloat16)
    ids = jnp.arange(C, dtype=jnp.int32) + 3

    def fn(f, i):
        return fused_score_topk.__wrapped__(
            f, i, top_k=5, want_values=False, max_id=C + 2)

    _export_tpu(fn, field, ids)


def test_pixel_text_topk_lowers():
    from rangeclip_tpu.ops.pallas.pixel_text_topk import fused_pixel_text_topk

    emb = jnp.zeros((B, H, W, D), jnp.bfloat16)
    text = jnp.zeros((C, D), jnp.bfloat16)
    mask = jnp.ones((C,), jnp.bool_)
    fn = functools.partial(fused_pixel_text_topk, top_k=5)
    _export_tpu(fn, emb, text, mask)


def test_pixel_text_ce_fwd_bwd_lower():
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

    n = B * H * W
    emb = jnp.zeros((B, H, W, D), jnp.bfloat16)
    temp = jnp.float32(0.07)
    labels = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), jnp.float32)
    text = jnp.zeros((C, D), jnp.bfloat16)
    cmask = jnp.ones((C,), jnp.bool_)

    def loss(e, t):
        return fused_pixel_text_ce(e, t, labels, valid, text, cmask)

    _export_tpu(loss, emb, temp)
    _export_tpu(jax.grad(loss, argnums=(0, 1)), emb, temp)


def test_pixel_text_ce_label_slots_lower():
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

    n, s = B * H * W, 4
    emb = jnp.zeros((B, H, W, D), jnp.bfloat16)
    temp = jnp.float32(0.07)
    labels = jnp.zeros((s, n), jnp.int32)
    valid = jnp.ones((s, n), jnp.float32)
    text = jnp.zeros((C, D), jnp.bfloat16)
    cmask = jnp.ones((C,), jnp.bool_)

    def loss(e, t):
        return fused_pixel_text_ce(e, t, labels, valid, text, cmask)

    _export_tpu(jax.grad(loss, argnums=(0, 1)), emb, temp)


def test_masked_pooling_lowers():
    from rangeclip_tpu.ops.pallas.masked_pooling import fused_masked_pooling

    emb = jnp.zeros((2048, D), jnp.float32)
    seg = jnp.zeros((2048,), jnp.int32)
    obj = jnp.arange(8, dtype=jnp.int32)
    _export_tpu(fused_masked_pooling, emb, seg, obj)


def test_class_presence_lowers():
    from rangeclip_tpu.ops.pallas.class_presence import fused_class_presence

    labels = jnp.zeros((4096,), jnp.int32)
    valid = jnp.ones((4096,), jnp.float32)
    fn = functools.partial(fused_class_presence, num_classes=C)
    _export_tpu(fn, labels, valid)


def test_histogram_lowers():
    from rangeclip_tpu.ops.pallas.histogram import fused_histogram

    idx = jnp.zeros((4, 1024), jnp.int32)
    fn = functools.partial(fused_histogram, n_bins=512)
    _export_tpu(fn, idx)


def test_l2_normalize_fwd_bwd_lower():
    from rangeclip_tpu.ops.pallas.l2_normalize import fused_l2_normalize

    x = jnp.zeros((B, H, W, D), jnp.bfloat16)
    _export_tpu(fused_l2_normalize, x)
    _export_tpu(_grad_sum(fused_l2_normalize), x)


def test_l2_normalize_field_fwd_bwd_lower():
    from rangeclip_tpu.ops.pallas.l2_normalize import (
        field_kernel_applicable, fused_l2_normalize_field)

    x = jnp.zeros((8, H, W, D), jnp.bfloat16)
    assert field_kernel_applicable(x.shape)
    _export_tpu(fused_l2_normalize_field, x)
    _export_tpu(_grad_sum(fused_l2_normalize_field), x)


def test_tv_rowtile_fwd_bwd_lower():
    from rangeclip_tpu.ops.pallas.tv_rowtile import (
        kernel_applicable, tv_rowtile)

    x = jnp.zeros((B, H, W, D), jnp.bfloat16)
    assert kernel_applicable(x.shape, x.dtype)
    w = jnp.ones((B,), jnp.float32)

    def loss(v):
        return tv_rowtile(v, w, upsample=2)

    _export_tpu(loss, x)
    _export_tpu(jax.grad(loss), x)


def test_tv_loss_fwd_bwd_lower():
    from rangeclip_tpu.ops.pallas.tv_loss import fused_tv_loss

    x = jnp.zeros((B, H, W, D), jnp.float32)
    _export_tpu(fused_tv_loss, x)
    _export_tpu(jax.grad(lambda v: fused_tv_loss(v)), x)


def test_head_topk_lowers():
    from rangeclip_tpu.ops.pallas.head_topk import fused_head_score_topk

    feats = jnp.zeros((B, H, W, D), jnp.bfloat16)
    hk = jnp.zeros((3, 3, D, D), jnp.bfloat16)
    text = jnp.zeros((C, D), jnp.bfloat16)
    mask = jnp.ones((C,), jnp.bool_)
    fn = functools.partial(fused_head_score_topk, top_k=5)
    _export_tpu(fn, feats, hk, text, mask)


def test_export_catches_unlowerable_kernel():
    """The guard itself works: a kernel using an unlowerable primitive
    (dynamic_slice of a value by a traced index — the exact packed-selector
    bug) must raise at export time."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def bad_kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(c, acc):
            return acc + jax.lax.dynamic_slice(x, (c, 0), (8, 128))

        o_ref[:] = jax.lax.fori_loop(0, 2, body, jnp.zeros((8, 128),
                                                           jnp.float32))

    def run(x):
        return pl.pallas_call(
            bad_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros((16, 128), jnp.float32)
    with pytest.raises(Exception, match="dynamic_slice|Unimplemented"):
        _export_tpu(run, x)


def test_pixel_text_ce_packed_lowers():
    """Packed-contrast form: gathered [K, D] table + global-id row compare
    (the broadcast of a [1, K] id row into the one-hot compares is the
    Mosaic-sensitive part — sublane-replicated rows have broken layout
    inference in where() before, score_topk docstring)."""
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

    n, s, K = B * H * W, 4, 128  # pretend C_global=256, packed to K=128
    emb = jnp.zeros((B, H, W, D), jnp.bfloat16)
    temp = jnp.float32(0.07)
    labels = jnp.zeros((s, n), jnp.int32)
    valid = jnp.ones((s, n), jnp.float32)
    table = jnp.zeros((K, D), jnp.bfloat16)
    pmask = jnp.ones((K,), jnp.bool_)
    ids = jnp.arange(K, dtype=jnp.int32) * 2  # ascending global ids

    def loss(e, t):
        return fused_pixel_text_ce(e, t, labels, valid, table, pmask,
                                   512, False, ids)

    _export_tpu(loss, emb, temp)
    _export_tpu(jax.grad(loss, argnums=(0, 1)), emb, temp)


# ---------------------------------------------------------------------------
# Canonical-config matrix: lower the PRODUCTION dispatch surface at the
# shapes the CLIs actually emit.  The 224^2 bf16 packed-CE backward was
# Mosaic-VMEM-rejected ON CHIP mid-round-3 (commit 5d822d8) because the
# lowering suite only exercised toy shapes; this matrix traces the real
# microbatch loss-and-grad (every kernel the train step dispatches, with
# the real trace-time tile choosers) and the real predict paths for the
# TPU platform at every shipped (resolution, C, dtype) combination, so
# envelope edges surface off-chip.  RANGECLIP_PLATFORM=tpu forces the
# kernel dispatch decisions while exporting from a CPU host.
# ---------------------------------------------------------------------------

# (H, microbatch B): 224^2 is the reference's canonical training config
# (train_segmentation_model.sh), 256^2 the bench/serving config, 512^2 the
# stretch config (smaller batch, matching the measured stretch rows).
_CANONICAL_RES = [(224, 32), (256, 32), (512, 8)]
_CANONICAL_C = [128, 256, 512, 2048]


def _canonical_train_export(H, B, C, dtype, monkeypatch):
    from rangeclip_tpu.losses.hybrid import HybridLossConfig
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig
    from rangeclip_tpu.training.train_step import make_microbatch_loss

    monkeypatch.setenv("RANGECLIP_PLATFORM", "tpu")
    D = 512
    model = DepthUNet(DepthUNetConfig(
        dtype=jnp.bfloat16 if dtype == "bf16" else None,
        use_batch_norm=True,
    ))
    # contrast_capacity 128 (the CLI default): C == 128 lowers the full-C
    # branch, C > 128 lowers the packed branch INCLUDING its lax.cond
    # full-C overflow fallback — both Mosaic programs compile per config.
    loss_fn = make_microbatch_loss(model, HybridLossConfig(
        contrast_capacity=128))

    variables = jax.eval_shape(
        lambda k, d: model.init(k, d, train=True),
        jax.random.key(0), jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32),
    )
    mb = {
        "depth": jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32),
        "segmentation": jax.ShapeDtypeStruct((B, H, H), jnp.int32),
        "object_label": jax.ShapeDtypeStruct((B,), jnp.int32),
        "image_embeddings": jax.ShapeDtypeStruct((B, D), jnp.float32),
        "sample_valid": jax.ShapeDtypeStruct((B,), jnp.float32),
    }
    args = (
        variables["params"], variables["batch_stats"], mb,
        jax.random.key(1), jnp.float32(0.25), jnp.float32(0.5),
        jax.ShapeDtypeStruct((C, D), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.bool_),
        jax.ShapeDtypeStruct((C, C), jnp.bool_),
    )
    grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)
    jax_export.export(jax.jit(grad_fn), platforms=("tpu",))(
        *jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    )


@pytest.mark.slow
@pytest.mark.parametrize("H,B", _CANONICAL_RES)
@pytest.mark.parametrize("C", _CANONICAL_C)
def test_canonical_train_step_lowers_bf16(H, B, C, monkeypatch):
    _canonical_train_export(H, B, C, "bf16", monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("H,B,C", [(224, 32, 512), (256, 32, 512)])
def test_canonical_train_step_lowers_fp32(H, B, C, monkeypatch):
    """fp32 is the bit-parity mode the parity CLIs run on chip."""
    _canonical_train_export(H, B, C, "fp32", monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("H,B,C,S,top_k", [
    (256, 128, 512, 384, 5),   # bench.py default (gathered candidates)
    (224, 8, 512, 384, 1),     # serve default (--top_k 1)
    (512, 8, 512, 384, 5),     # stretch-config serving
])
def test_canonical_predict_lowers(H, B, C, S, top_k, monkeypatch):
    """The default (unfolded, gathered-candidate Pallas scoring) AND the
    folded-head predict paths at the CLI/bench shapes."""
    from rangeclip_tpu.models.depth_unet import (
        DepthUNet, DepthUNetConfig, predict_folded)

    monkeypatch.setenv("RANGECLIP_PLATFORM", "tpu")
    D = 512
    model = DepthUNet(DepthUNetConfig(dtype=jnp.bfloat16,
                                      use_batch_norm=True))
    variables = jax.eval_shape(
        lambda k, d: model.init(k, d, train=False),
        jax.random.key(0), jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32),
    )
    depth = jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32)
    text = jax.ShapeDtypeStruct((C, D), jnp.float32)
    idxs = jax.ShapeDtypeStruct((S,), jnp.int32)

    def unfolded(v, d, t, ids):
        out, _, _ = model.apply(
            v, d, t, None, top_k, method=DepthUNet.predict,
            return_embeddings=False, candidate_indices=ids)
        return out

    def folded(v, d, t, ids):
        return predict_folded(model, v, d, t, top_k=top_k,
                              candidate_indices=ids)

    for fn in (unfolded, folded):
        jax_export.export(jax.jit(fn), platforms=("tpu",))(
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                         variables),
            depth, text, idxs,
        )


def test_conv_score_topk_lowers():
    """Round-5 fused conv+selection kernel (predict_folded's bf16 B%128
    fast path) — also exercised at the bench shape by
    test_canonical_predict_lowers[256-128-512-384-5]."""
    from rangeclip_tpu.ops.pallas.conv_score_topk import fused_conv_score_topk

    feats = jnp.zeros((128, 4, 16, 8), jnp.bfloat16)
    fold = jnp.zeros((3, 3, 8, 128), jnp.bfloat16)
    ids = jnp.arange(128, dtype=jnp.int32)
    _export_tpu(
        lambda f, k, i: fused_conv_score_topk(f, k, i, top_k=5,
                                              want_values=True)[0],
        feats, fold, ids,
    )
