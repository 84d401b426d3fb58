"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeclip_tpu.ops.pallas.pixel_text_topk import fused_pixel_text_topk
from rangeclip_tpu.utils.math import l2_normalize


def test_fused_pixel_text_topk_matches_xla():
    rng = np.random.default_rng(0)
    N, D, C, K = 100, 32, 64, 5
    emb = rng.standard_normal((N, D)).astype(np.float32)
    text = rng.standard_normal((C, D)).astype(np.float32)
    mask = np.zeros(C, bool)
    mask[rng.choice(C, 40, replace=False)] = True

    text_n = np.asarray(l2_normalize(jnp.asarray(text), axis=-1))
    idx, val = fused_pixel_text_topk(
        jnp.asarray(emb), jnp.asarray(text_n), jnp.asarray(mask),
        top_k=K, tile_n=32, interpret=True,
    )

    # XLA reference
    emb_n = np.asarray(l2_normalize(jnp.asarray(emb), axis=-1))
    logits = emb_n @ text_n.T
    logits = np.where(mask[None, :], logits, -1e30)
    want_val, want_idx = jax.lax.top_k(jnp.asarray(logits), K)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(want_val),
                               rtol=1e-5, atol=1e-6)
    # all selected classes are candidates
    assert mask[np.asarray(idx).reshape(-1)].all()

    # gathered reduced-table form: table rows are the candidate classes,
    # candidate_ids maps rows -> global ids in-kernel; labels must be
    # bit-identical to the masked full-table call (ascending ids keep the
    # tie-break order)
    cand = np.flatnonzero(mask).astype(np.int32)  # ascending
    S = 48  # padded capacity
    ids = np.full(S, -1, np.int32)
    ids[: len(cand)] = cand
    sub = np.zeros((S, D), np.float32)
    sub[: len(cand)] = text_n[cand]
    idx_g, val_g = fused_pixel_text_topk(
        jnp.asarray(emb), jnp.asarray(sub), jnp.asarray(ids >= 0),
        top_k=K, tile_n=32, interpret=True, candidate_ids=jnp.asarray(ids),
    )
    np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(val_g), np.asarray(want_val),
                               rtol=1e-5, atol=1e-6)


def test_topk_exhausted_candidate_set_emits_sentinel():
    """Fewer candidates than top_k: every path — the Pallas kernel, the
    masked XLA branch, and the gathered XLA branch — emits the real
    candidates followed by the -1 no-candidate sentinel (never duplicate
    or non-candidate ids).  The reference crashes in this regime
    (torch.topk(k) over a shorter candidate list)."""
    from rangeclip_tpu.models.depth_unet import NEG_INF

    rng = np.random.default_rng(5)
    N, D, C, K = 16, 8, 16, 5
    emb = rng.standard_normal((N, D)).astype(np.float32)
    text = rng.standard_normal((C, D)).astype(np.float32)
    mask = np.zeros(C, bool)
    mask[[3, 9]] = True  # only 2 candidates < K

    text_n = np.asarray(l2_normalize(jnp.asarray(text), axis=-1))
    idx, _ = fused_pixel_text_topk(
        jnp.asarray(emb), jnp.asarray(text_n), jnp.asarray(mask),
        top_k=K, tile_n=16, interpret=True,
    )
    idx = np.asarray(idx)
    assert set(idx[:, 0]) <= {3, 9} and set(idx[:, 1]) <= {3, 9}
    assert (idx[:, 0] != idx[:, 1]).all()
    assert (idx[:, 2:] == -1).all()

    # masked XLA branch of DepthUNet.predict (the same tail logic inline)
    emb_n = np.asarray(l2_normalize(jnp.asarray(emb), axis=-1))
    logits = jnp.where(jnp.asarray(mask)[None, :],
                       jnp.asarray(emb_n @ text_n.T), NEG_INF)
    vals, want = jax.lax.top_k(logits, K)
    want = jnp.where(vals > -1e29, want, -1)
    np.testing.assert_array_equal(idx, np.asarray(want))


def test_fused_masked_pooling_matches_xla():
    from rangeclip_tpu.ops.pallas.masked_pooling import fused_masked_pooling

    rng = np.random.default_rng(1)
    P, D, N = 300, 16, 6
    emb = rng.standard_normal((P, D)).astype(np.float32)
    seg = rng.integers(0, 10, size=P).astype(np.int32)
    objs = np.array([0, 2, 4, 6, 8, 99], np.int32)  # 99 absent

    sums, counts = fused_masked_pooling(
        jnp.asarray(emb), jnp.asarray(seg), jnp.asarray(objs),
        tile_p=128, interpret=True,
    )
    match = (seg[None, :] == objs[:, None]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sums), match @ emb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), match.sum(1), rtol=1e-6)
    assert float(np.asarray(counts)[-1]) == 0.0  # absent object


def test_masked_average_pooling_pallas_path_matches_xla_path():
    from rangeclip_tpu.losses.pooling import masked_average_pooling

    rng = np.random.default_rng(2)
    emb = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    seg = rng.integers(0, 5, size=(2, 8, 8)).astype(np.int32)
    objs = np.arange(5, dtype=np.int32)
    a = np.asarray(masked_average_pooling(
        jnp.asarray(emb), jnp.asarray(seg), jnp.asarray(objs), use_pallas="never"))
    import jax.experimental.pallas as _pl  # noqa: F401  (kernel import check)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        b = np.asarray(masked_average_pooling(
            jnp.asarray(emb), jnp.asarray(seg), jnp.asarray(objs),
            use_pallas="always"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_class_presence_matches_scatter():
    from rangeclip_tpu.ops.pallas.class_presence import fused_class_presence

    rng = np.random.default_rng(3)
    N, C = 5000, 64
    labels = rng.integers(0, C, size=N).astype(np.int32)
    valid = (rng.random(N) > 0.3).astype(np.float32)
    # some classes never valid
    valid[np.isin(labels, [3, 7])] = 0.0

    got = np.asarray(fused_class_presence(
        jnp.asarray(labels), jnp.asarray(valid), C, tile_n=512, interpret=True))
    want = np.zeros(C, bool)
    np.maximum.at(want, labels, valid > 0)
    np.testing.assert_array_equal(got, want)
    assert not got[3] and not got[7]


def test_fused_pixel_text_ce_matches_xla_values_and_grads():
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce
    from rangeclip_tpu.losses.infonce import pixel_text_infonce

    rng = np.random.default_rng(4)
    N, D, C = 300, 32, 48
    s = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 20, N), jnp.int32)
    valid = jnp.asarray((rng.random(N) > 0.3), jnp.float32)
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    mask = np.zeros(C, bool)
    mask[np.unique(np.asarray(labels))] = True
    mask[rng.choice(C, 10, replace=False)] = True
    mask = jnp.asarray(mask)
    text_n = l2_normalize(text, axis=-1)

    def fused(s, t):
        return fused_pixel_text_ce(
            s, t, labels, valid, text_n, mask, 64, True
        ) / jnp.maximum(jnp.sum(valid), 1.0)

    def ref(s, t):
        return pixel_text_infonce(s, labels, valid, text, mask, t)

    t0 = jnp.float32(0.07)
    np.testing.assert_allclose(float(fused(s, t0)), float(ref(s, t0)), rtol=1e-5)
    ga = jax.grad(ref, argnums=(0, 1))(s, t0)
    gb = jax.grad(fused, argnums=(0, 1))(s, t0)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(ga[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(gb[1]), float(ga[1]), rtol=1e-4)


def test_fused_ce_bf16_matmul_mode(monkeypatch):
    """bf16 samples flip the CE kernel's MXU operands to bf16 (f32 accum).

    The forward must equal an XLA oracle applying the identical operand
    rounding (normalize in f32, round emb+text to bf16, dot with f32
    accumulation); gradients must track the all-f32 kernel within bf16
    tolerance; and RANGECLIP_CE_MATMUL=f32 must restore the all-f32 matmul
    bit-for-bit.
    """
    from rangeclip_tpu.ops.pallas.pixel_text_ce import (
        _mm_dtype,
        fused_pixel_text_ce,
    )

    rng = np.random.default_rng(11)
    N, D, C = 256, 32, 48
    s32 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    s16 = s32.astype(jnp.bfloat16)
    assert _mm_dtype(s16) == jnp.bfloat16 and _mm_dtype(s32) == jnp.float32
    labels = jnp.asarray(rng.integers(1, 20, N), jnp.int32)
    valid = jnp.asarray((rng.random(N) > 0.3), jnp.float32)
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    mask = np.zeros(C, bool)
    mask[np.unique(np.asarray(labels))] = True
    mask = jnp.asarray(mask)
    text_n = l2_normalize(text, axis=-1)
    t0 = jnp.float32(0.07)

    def fused(s, t):
        return fused_pixel_text_ce(s, t, labels, valid, text_n, mask, 64, True)

    def oracle_bf16(s, t):
        emb = l2_normalize(s.astype(jnp.float32), axis=-1)
        logits = jax.lax.dot_general(
            emb.astype(jnp.bfloat16), text_n.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / t
        logits = jnp.where(mask[None, :], logits, -1e30)
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return jnp.sum((lse - picked) * valid)

    np.testing.assert_allclose(float(fused(s16, t0)),
                               float(oracle_bf16(s16, t0)), rtol=1e-5)

    # gradients: bf16-matmul kernel tracks the all-f32 kernel to bf16 noise
    monkeypatch.setenv("RANGECLIP_CE_MATMUL", "f32")
    val_f32 = float(fused(s16, t0))
    g_f32 = jax.grad(fused, argnums=(0, 1))(s16, t0)
    # forcing f32 with bf16 samples == the pre-bf16 kernel on upcast samples
    np.testing.assert_allclose(val_f32, float(fused(s16.astype(jnp.float32),
                                                    t0)), rtol=1e-6)
    monkeypatch.setenv("RANGECLIP_CE_MATMUL", "bf16")
    g_b = jax.grad(fused, argnums=(0, 1))(s16, t0)
    scale = np.max(np.abs(np.asarray(g_f32[0], np.float32)))
    np.testing.assert_allclose(
        np.asarray(g_b[0], np.float32), np.asarray(g_f32[0], np.float32),
        atol=3e-2 * scale)
    np.testing.assert_allclose(float(g_b[1]), float(g_f32[1]), rtol=3e-2)


def test_fused_tv_loss_matches_xla_values_and_grads():
    import rangeclip_tpu.ops.pallas.tv_loss as tvmod
    from rangeclip_tpu.losses.smoothness import total_variation_loss

    rng = np.random.default_rng(5)
    for B, H, W, D, TR in [(2, 8, 4, 16, 4), (3, 5, 4, 8, 8)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
        np.testing.assert_allclose(
            float(tvmod.fused_tv_loss(x, TR, True)),
            float(total_variation_loss(x)), rtol=1e-5)
        ga = jax.grad(total_variation_loss)(x)
        gb = jax.grad(lambda x: tvmod.fused_tv_loss(x, TR, True))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=1e-5, atol=1e-6)

    # multi-chunk path (column seams)
    orig = tvmod._choose_chunk
    tvmod._choose_chunk = (
        lambda WD, D: WD // 4 if WD % 4 == 0 and WD // 4 >= 2 * D else WD
    )
    try:
        x = jnp.asarray(rng.standard_normal((2, 9, 16, 8)), jnp.float32)
        np.testing.assert_allclose(
            float(tvmod.fused_tv_loss(x, 4, True)),
            float(total_variation_loss(x)), rtol=1e-5)
        ga = jax.grad(total_variation_loss)(x)
        gb = jax.grad(lambda x: tvmod.fused_tv_loss(x, 4, True))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=1e-5, atol=1e-6)
    finally:
        tvmod._choose_chunk = orig


def test_fused_ce_4d_field_path_matches_flat():
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

    rng = np.random.default_rng(6)
    # W=128 satisfies the 128-lane row-tile constraint, so this exercises
    # the true 4-D block path (not the flat fallback)
    from rangeclip_tpu.ops.pallas.pixel_text_ce import _rows_per_block
    B, H, W, D, C = 2, 4, 128, 16, 24
    assert _rows_per_block(H, W) is not None
    x4 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 10, B * H * W), jnp.int32)
    valid = jnp.asarray((rng.random(B * H * W) > 0.3), jnp.float32)
    text_n = l2_normalize(
        jnp.asarray(rng.standard_normal((C, D)), jnp.float32), axis=-1
    )
    mask = jnp.ones(C, bool)

    def f(s, t):
        return fused_pixel_text_ce(s, t, labels, valid, text_n, mask, 8, True)

    t0 = jnp.float32(0.07)
    np.testing.assert_allclose(
        float(f(x4, t0)), float(f(x4.reshape(-1, D), t0)), rtol=1e-5)
    g4 = jax.grad(f, argnums=(0, 1))(x4, t0)
    g2 = jax.grad(f, argnums=(0, 1))(x4.reshape(-1, D), t0)
    # The class-major backward contracts d_emb over the MAJOR (class) axis
    # (delta [C, TN] x text [C, D]); CPU XLA's dot blocking then depends
    # on the tile width, so the 4-D (TN=128) and flat (TN=8) paths agree
    # only up to f32 accumulation order — ~2e-6 abs on near-cancelling
    # delta entries (measured), not bit-exactly as the row-major form did.
    np.testing.assert_allclose(
        np.asarray(g4[0]), np.asarray(g2[0]).reshape(B, H, W, D),
        rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(float(g4[1]), float(g2[1]), rtol=1e-5)


def test_fused_topk_4d_field_path_matches_flat():
    from rangeclip_tpu.ops.pallas.pixel_text_ce import _rows_per_block

    rng = np.random.default_rng(7)
    B, H, W, D, C, K = 2, 4, 128, 16, 24, 5
    assert _rows_per_block(H, W) is not None
    x4 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    text_n = np.asarray(l2_normalize(
        jnp.asarray(rng.standard_normal((C, D)), jnp.float32), axis=-1))
    mask = np.zeros(C, bool)
    mask[rng.choice(C, 16, replace=False)] = True

    idx4, val4 = fused_pixel_text_topk(
        x4, jnp.asarray(text_n), jnp.asarray(mask), top_k=K, interpret=True)
    idx2, val2 = fused_pixel_text_topk(
        x4.reshape(-1, D), jnp.asarray(text_n), jnp.asarray(mask),
        top_k=K, tile_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx4), np.asarray(idx2))
    np.testing.assert_allclose(np.asarray(val4), np.asarray(val2),
                               rtol=1e-5, atol=1e-6)

    # bf16 field: same top-k winners on well-separated random scores
    idxb, _ = fused_pixel_text_topk(
        x4.astype(jnp.bfloat16), jnp.asarray(text_n), jnp.asarray(mask),
        top_k=K, interpret=True)
    assert (np.asarray(idxb) == np.asarray(idx4)).mean() > 0.95


def test_fused_head_matches_predict():
    """The fully-fused head kernel (conv+normalize+score+topk,
    head_topk.py) returns the same labels as DepthUNet.predict's XLA path
    at fp32."""
    from rangeclip_tpu.models.depth_unet import (
        DepthUNet, DepthUNetConfig, build_candidate_mask, predict_topk_fused,
    )

    cfg = DepthUNetConfig(
        encoder_filters=(8, 16, 16, 16, 32), embedding_dim=32,
        use_batch_norm=True,
    )
    model = DepthUNet(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    vars_ = model.init(jax.random.key(0), x, train=False)
    C = 12
    text = jax.random.normal(jax.random.key(2), (C, 32))
    seg = jax.random.randint(jax.random.key(3), (2, 32, 32), 0, 6)
    mask = build_candidate_mask(jax.random.key(4), seg, C, num_negatives=4)

    want, _, _ = model.apply(
        vars_, x, text, mask, 5, method=DepthUNet.predict, scoring="xla"
    )
    got = predict_topk_fused(model, vars_, x, text, mask, top_k=5,
                             interpret=True)
    assert got.shape == want.shape == (2, 32, 32, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_ce_label_slots_match_xla():
    """Multi-slot CE (the native-resolution training path): the fused
    kernel with [S, N] labels/weights matches the XLA slot formulation in
    value and gradients (samples + temperature)."""
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce
    from rangeclip_tpu.losses.infonce import pixel_text_infonce

    rng = np.random.default_rng(9)
    S, N, D, C = 4, 256, 32, 48
    s = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 20, (S, N)), jnp.int32)
    valid = jnp.asarray((rng.random((S, N)) * 2.0) * (rng.random((S, N)) > 0.3),
                        jnp.float32)
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    mask = np.zeros(C, bool)
    mask[np.unique(np.asarray(labels))] = True
    mask = jnp.asarray(mask)
    text_n = l2_normalize(text, axis=-1)

    def fused(s, t):
        return fused_pixel_text_ce(
            s, t, labels, valid, text_n, mask, 64, True
        ) / jnp.maximum(jnp.sum(valid), 1.0)

    def ref(s, t):
        return pixel_text_infonce(s, labels, valid, text, mask, t)

    t0 = jnp.float32(0.07)
    np.testing.assert_allclose(float(fused(s, t0)), float(ref(s, t0)),
                               rtol=1e-5)
    ga = jax.grad(ref, argnums=(0, 1))(s, t0)
    gb = jax.grad(fused, argnums=(0, 1))(s, t0)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(ga[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(gb[1]), float(ga[1]), rtol=1e-4)


def test_large_class_count_tiles_shrink_and_match():
    """NYUv2-transfer scale: the row-tile caps scale inversely with C so
    VMEM stays bounded, and results still match XLA at C=4096."""
    from rangeclip_tpu.ops.pallas.pixel_text_ce import _fwd_rows, _bwd_rows
    from rangeclip_tpu.ops.pallas.pixel_text_topk import (
        _topk_rows_per_block,
        fused_pixel_text_topk,
    )

    # tile caps: 4x the classes -> 1/4 the rows (to the 128 floor)
    assert _topk_rows_per_block(128, 128, C=512) * 128 == 2048
    assert _topk_rows_per_block(128, 128, C=4096) * 128 == 256
    assert _fwd_rows(128, 128, C=4096) * 128 <= 256
    assert _bwd_rows(128, 128, C=4096) * 128 <= 256
    # Canonical measured defaults (experiments/ce_rows_probe.py) — on-chip
    # VMEM limits, don't bump without re-measuring there:
    assert _fwd_rows(128, 128, C=512) == 8
    assert _bwd_rows(128, 128, C=512) == 2
    assert _fwd_rows(128, 128, C=128) == 16   # packed contrast
    assert _bwd_rows(128, 128, C=128) == 8    # rh=16 VMEM-rejected on chip
    # 224^2 native field (W=112): rh=2 is lane-invalid (224 % 128 != 0);
    # the backward fallback must scan ASCENDING to rh=8 (TN=896, compiles
    # on chip at C in {128, 256, 512}) — the old descending scan picked
    # rh=16, whose [1792, 256] tiles are Mosaic-VMEM-rejected (crashed the
    # canonical-scale convergence run; probed 2026-08-20).
    assert _bwd_rows(112, 112, C=256) == 8
    assert _bwd_rows(112, 112, C=512) == 8
    assert _fwd_rows(112, 112, C=256) == 16
    # Past the measured envelope (TN=896 > 256 cap at C>512) the picker
    # must refuse the 4-D path entirely (flat fallback), not guess:
    assert _bwd_rows(112, 112, C=1024) is None

    C, D, N = 4096, 32, 128
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    text_n = l2_normalize(text, axis=-1)
    mask = np.zeros(C, bool)
    mask[rng.choice(C, 600, replace=False)] = True
    mask = jnp.asarray(mask)

    idx, val = fused_pixel_text_topk(x, text_n, mask, top_k=5, interpret=True)
    x_n = l2_normalize(x, axis=-1)
    logits = jnp.where(mask[None, :], x_n @ text_n.T, -1e30)
    ref_val, ref_idx = jax.lax.top_k(logits, 5)
    assert (np.asarray(idx) == np.asarray(ref_idx)).mean() > 0.95
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-5, atol=1e-6)


def test_fused_score_topk_matches_lax():
    """score_topk.py (the folded-head selector): masked lane top-k with
    in-kernel global-id remap == lax.top_k over masked scores + take."""
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    rng = np.random.default_rng(21)
    N, S, K = 64, 128, 5
    scores = jnp.asarray(rng.standard_normal((N, S)), jnp.float32)
    # ascending global ids with trailing -1 padding (the
    # build_candidate_indices contract)
    n_valid = 90
    ids = np.full(S, -1, np.int32)
    ids[:n_valid] = np.sort(rng.choice(500, n_valid, replace=False))
    ids = jnp.asarray(ids)

    idx, val = fused_score_topk(scores, ids, top_k=K, want_values=True,
                                interpret=True)

    masked = jnp.where(ids[None, :] >= 0, scores, -1e30)
    ref_val, ref_slot = jax.lax.top_k(masked, K)
    ref_idx = jnp.take(ids, ref_slot, axis=0)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-6, atol=1e-7)

    # default ids = arange (all valid)
    idx2, _ = fused_score_topk(scores, top_k=K, interpret=True)
    _, ref_slot2 = jax.lax.top_k(scores, K)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(ref_slot2))


def test_fused_score_topk_ties_and_overflow():
    """Duplicate scores break ties to the smallest id; top_k larger than
    the valid-slot count yields -1 fills, matching the XLA remap path."""
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    S = 128
    ids = np.full(S, -1, np.int32)
    ids[:3] = [4, 7, 9]
    row = np.full(S, 0.5, np.float32)
    row[:3] = [2.0, 2.0, 1.0]  # tie between ids 4 and 7
    scores = jnp.asarray(np.tile(row, (8, 1)))
    ids = jnp.asarray(ids)

    idx, _ = fused_score_topk(scores, ids, top_k=5, interpret=True)
    masked = jnp.where(ids[None, :] >= 0, scores, -1e30)
    _, ref_slot = jax.lax.top_k(masked, 5)
    ref_idx = jnp.take(ids, ref_slot, axis=0)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    assert np.asarray(idx)[0, :3].tolist() == [4, 7, 9]
    assert (np.asarray(idx)[:, 3:] == -1).all()


def test_fused_score_topk_4d_matches_2d():
    """The conv-layout [h, w, B, S] form selects identically to the flat
    [N, S] form (free logical transpose trick)."""
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    rng = np.random.default_rng(22)
    h, w, B, S = 4, 8, 4, 128
    field = jnp.asarray(rng.standard_normal((h, w, B, S)), jnp.bfloat16)
    ids = jnp.asarray(np.arange(S, dtype=np.int32))

    idx4, val4 = fused_score_topk(field, ids, top_k=3, want_values=True,
                                  interpret=True)
    idx2, val2 = fused_score_topk(field.reshape(-1, S), ids, top_k=3,
                                  want_values=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx4), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(val4), np.asarray(val2))


def test_tv_rowtile_matches_xla():
    """tv_rowtile.py (the one-pass TV kernel): value within f32
    partial-sum order of the XLA formulation, gradient BIT-equal to the
    hand-derived sign-field VJP — unweighted/weighted, upsampled, and at
    exact ties (the +1 convention)."""
    from rangeclip_tpu.losses.smoothness import _tv, total_variation_loss
    from rangeclip_tpu.ops.pallas.tv_rowtile import tv_rowtile

    rng = np.random.default_rng(31)
    B, H, W, D = 3, 16, 16, 128
    # quantized values force exact bf16 ties across neighbors
    x = jnp.asarray(
        np.round(rng.standard_normal((B, H, W, D)) * 2) / 2, jnp.bfloat16)

    for up in (1, 2):
        ref, ref_g = jax.value_and_grad(lambda v, u=up: _tv(v, u))(x)
        got, got_g = jax.value_and_grad(
            lambda v, u=up: tv_rowtile(v, None, u, True))(x)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))

    w = jnp.asarray([1.0, 0.0, 1.0])
    scale = B / 2.0
    ref, ref_g = jax.value_and_grad(
        lambda v: total_variation_loss(v, upsample=2, sample_weight=w))(x)
    got, got_g = jax.value_and_grad(
        lambda v: tv_rowtile(v, w, 2, True) * scale)(x)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))


def test_tv_rowtile_multi_tile_halos(monkeypatch):
    """Force tiny tile budgets so tiles are FRACTIONS of an image (at the
    real train shape rt < H too): the forward halo pair, the backward
    up/dn halo reads, and every cross-tile mask must all be live — a
    whole-image tile (rt == H) masks them all and would hide index-map
    regressions."""
    import rangeclip_tpu.ops.pallas.tv_rowtile as tvk
    from rangeclip_tpu.losses.smoothness import _tv
    from rangeclip_tpu.ops.pallas.tv_rowtile import tv_rowtile

    rng = np.random.default_rng(33)
    B, H, W, D = 2, 8, 8, 128
    x = jnp.asarray(
        np.round(rng.standard_normal((B, H, W, D)) * 2) / 2, jnp.bfloat16)
    # 2 image rows per forward tile, 1 per backward tile
    monkeypatch.setattr(tvk, "_FWD_TILE_BYTES", 2 * W * D * 2)
    monkeypatch.setattr(tvk, "_BWD_TILE_BYTES", 1 * W * D * 2)

    ref, ref_g = jax.value_and_grad(lambda v: _tv(v, 1))(x)
    got, got_g = jax.value_and_grad(
        lambda v: tv_rowtile(v, None, 1, True))(x)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))


def test_fused_score_topk_packed_matches_knockout():
    """The bf16 packed-key sorted-insert selector (the perf-mode default)
    is bit-identical to the knockout loop — ids AND decoded values —
    including duplicate-score ties, masked slots, and overflow fills."""
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    rng = np.random.default_rng(23)
    N, S, K = 64, 384, 5
    # quantized values force many exact bf16 ties; include negatives
    sc = jnp.asarray(
        np.round(rng.standard_normal((N, S)) * 4) / 4, jnp.bfloat16)
    ids = np.full(S, -1, np.int32)
    ids[:300] = np.sort(rng.choice(2000, 300, replace=False))
    ids = jnp.asarray(ids)

    kn = fused_score_topk(sc, ids, top_k=K, want_values=True,
                          interpret=True, selector="knockout")
    pk = fused_score_topk(sc, ids, top_k=K, want_values=True,
                          interpret=True, selector="packed", max_id=1999)
    np.testing.assert_array_equal(np.asarray(kn[0]), np.asarray(pk[0]))
    np.testing.assert_array_equal(np.asarray(kn[1]), np.asarray(pk[1]))

    # overflow: fewer valid slots than top_k -> -1 / NEG_INF fills
    ids2 = np.full(S, -1, np.int32)
    ids2[:3] = [4, 7, 9]
    row = np.full(S, 0.5, np.float32)
    row[:3] = [2.0, 2.0, 1.0]
    sc2 = jnp.asarray(np.tile(row, (8, 1)), jnp.bfloat16)
    idx, val = fused_score_topk(sc2, jnp.asarray(ids2), top_k=5,
                                want_values=True, interpret=True,
                                selector="packed", max_id=9)
    a = np.asarray(idx)
    assert a[0, :3].tolist() == [4, 7, 9]
    assert (a[:, 3:] == -1).all()
    assert (np.asarray(val)[:, 3:] == -1e30).all()


def test_predict_folded_matches_predict():
    """predict_folded (output conv contracted with the text table, no
    normalization) ranks identically to DepthUNet.predict — same labels
    everywhere the score margin exceeds fp32 cross-path rounding."""
    from rangeclip_tpu.models.depth_unet import (
        DepthUNet, DepthUNetConfig, build_candidate_indices, predict_folded,
    )
    from rangeclip_tpu.utils.math import l2_normalize as l2n

    cfg = DepthUNetConfig(
        encoder_filters=(8, 16, 16, 16, 32), embedding_dim=32,
        use_batch_norm=True,
    )
    model = DepthUNet(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    vars_ = model.init(jax.random.key(0), x, train=False)
    C, K = 128, 5
    text = jax.random.normal(jax.random.key(2), (C, 32))
    seg = jax.random.randint(jax.random.key(3), (2, 32, 32), 0, 6)
    cand = build_candidate_indices(jax.random.key(4), seg, C, 40,
                                   capacity=128)

    want, emb, _ = model.apply(
        vars_, x, text, None, K, method=DepthUNet.predict, scoring="xla",
        candidate_indices=cand,
    )
    for interpret in (False, True):  # XLA fallback branch + Pallas kernel
        got = predict_folded(model, vars_, x, text, top_k=K,
                             candidate_indices=cand, interpret=interpret)
        assert got.shape == want.shape == (2, 32, 32, K)
        agree = (np.asarray(got) == np.asarray(want))
        # cross-path fp32 rounding may flip exact near-ties only: wherever
        # labels differ, the two classes' default-path scores must be equal
        # to within rounding
        if not agree.all():
            logits = jnp.einsum(
                "bhwd,cd->bhwc", emb.astype(jnp.float32),
                l2n(text.astype(jnp.float32), axis=-1),
            )
            g = np.take_along_axis(np.asarray(logits), np.asarray(got), -1)
            w_ = np.take_along_axis(np.asarray(logits), np.asarray(want), -1)
            np.testing.assert_allclose(g[~agree], w_[~agree], atol=1e-5)
            assert agree.mean() > 0.99
    # full-table (mask-free) form
    got_full = predict_folded(model, vars_, x, text, top_k=K,
                              interpret=True)
    want_full, _, _ = model.apply(
        vars_, x, text, jnp.ones(C, bool), K, method=DepthUNet.predict,
        scoring="xla",
    )
    agree = (np.asarray(got_full) == np.asarray(want_full)).mean()
    assert agree > 0.99
    # non-lane-multiple class count: the kernel path pads slots with -1
    # ids internally (open-set CLIs pass arbitrary label-CSV sizes)
    got_odd = predict_folded(model, vars_, x, text[:100], top_k=K,
                             interpret=True)
    want_odd, _, _ = model.apply(
        vars_, x, text[:100], jnp.ones(100, bool), K,
        method=DepthUNet.predict, scoring="xla",
    )
    assert (np.asarray(got_odd) == np.asarray(want_odd)).mean() > 0.99


def test_fused_histogram_matches_scatter():
    from rangeclip_tpu.ops.pallas.histogram import fused_histogram

    rng = np.random.default_rng(11)
    B, N, P = 3, 5000, 1000  # P not a multiple of 256; N not of chunk
    idx = rng.integers(0, P, size=(B, N)).astype(np.int32)
    idx[0, :77] = -1  # negative = ignored (chunk padding convention)

    got = np.asarray(fused_histogram(
        jnp.asarray(idx), P, chunk=1024, interpret=True))
    want = np.zeros((B, P), np.float32)
    for b in range(B):
        np.add.at(want[b], idx[b][idx[b] >= 0], 1.0)
    np.testing.assert_array_equal(got, want)

    # small-bin edge: n_bins < 256 still pads the sublane axis to 8 rows
    idx_small = np.where(idx >= 0, idx % 50, -1).astype(np.int32)
    got_small = np.asarray(fused_histogram(
        jnp.asarray(idx_small), 50, chunk=1024, interpret=True))
    want_small = np.zeros((B, 50), np.float32)
    for b in range(B):
        np.add.at(want_small[b], idx_small[b][idx_small[b] >= 0], 1.0)
    np.testing.assert_array_equal(got_small, want_small)


def test_sample_pixel_multiplicities_kernel_path_matches(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    from rangeclip_tpu.losses.infonce import sample_pixel_multiplicities

    rng = np.random.default_rng(5)
    B, H, W = 2, 16, 16
    target = jnp.asarray(rng.integers(0, 6, size=(B, H, W)), jnp.int32)
    key = jax.random.PRNGKey(7)

    for slots in (1, 2):
        w_ref, l_ref = sample_pixel_multiplicities(
            key, target, percent=0.7, slots=slots)
        monkeypatch.setenv("RANGECLIP_PLATFORM", "tpu")
        with pltpu.force_tpu_interpret_mode():
            w_k, l_k = sample_pixel_multiplicities(
                key, target, percent=0.7, slots=slots)
        monkeypatch.delenv("RANGECLIP_PLATFORM")
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_k))
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_k))


def test_fused_l2_normalize_matches_xla_values_and_grads():
    from rangeclip_tpu.ops.pallas.l2_normalize import (
        field_kernel_applicable,
        fused_l2_normalize,
        fused_l2_normalize_field,
    )

    assert field_kernel_applicable((8, 4, 16, 128))
    assert not field_kernel_applicable((3, 4, 16, 128))  # B % 8
    assert not field_kernel_applicable((8, 4, 12, 128))  # W % 8
    assert not field_kernel_applicable((8, 4, 16, 96))   # D % 128
    # Over-budget batches (no w-tile >= 8 fits the backward's 1024-row
    # VMEM budget) must report inapplicable, not fail Mosaic compilation.
    assert not field_kernel_applicable((256, 4, 16, 128))

    # _pick_wb regression: must terminate with a valid multiple-of-8
    # divisor of W for every applicable shape (a previous version
    # decremented by 8 from an unaligned start and hung the trace for
    # e.g. B=24/96 at W=128).
    from rangeclip_tpu.ops.pallas.l2_normalize import _pick_wb
    for Bsz in (8, 16, 24, 32, 40, 48, 88, 96, 104, 128):
        for W in (8, 16, 24, 64, 96, 128, 256):
            for n_ops in (1, 2):
                wb = _pick_wb(W, Bsz, n_ops)
                budget = 2048 if n_ops == 1 else 1024
                if wb is not None:
                    assert wb % 8 == 0 and W % wb == 0
                    assert wb * Bsz <= budget
                else:
                    assert budget // Bsz < 8

    def ref_fn(x):
        return jnp.sum(jnp.sin(l2_normalize(x.astype(jnp.float32), axis=-1)))

    for variant in (fused_l2_normalize, fused_l2_normalize_field):
        # (24, 2, 128, 128) exercises a budget-limited w-tile that does not
        # divide W on the first try (fwd wb=64, bwd wb=32 — the shape whose
        # tile search previously hung at trace time).
        shapes = ([(8, 4, 16, 128), (24, 2, 128, 128)]
                  if variant is fused_l2_normalize_field
                  else [(8, 4, 16, 128), (64, 256)])
        for shape in shapes:
            for dtype, rtol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
                x = jax.random.normal(
                    jax.random.key(0), shape, jnp.float32).astype(dtype)
                y = variant(x, True)
                assert y.dtype == dtype and y.shape == shape
                y_ref = l2_normalize(x.astype(jnp.float32), axis=-1)
                np.testing.assert_allclose(
                    np.asarray(y, np.float32), np.asarray(y_ref),
                    rtol=rtol, atol=rtol)
                g = jax.grad(lambda x: jnp.sum(jnp.sin(
                    variant(x, True).astype(jnp.float32))))(x)
                g_ref = jax.grad(ref_fn)(x.astype(jnp.float32))
                np.testing.assert_allclose(
                    np.asarray(g, np.float32), np.asarray(g_ref),
                    rtol=rtol, atol=rtol)

    # All-zero rows (norm < eps): the kernels stay FINITE (y = x/eps = 0,
    # dx = g/eps) where XLA's autodiff of the same composite NaNs on the
    # 0/0 inside the sqrt chain — a measure-zero input on real embeddings,
    # documented divergence in the kernel's favor.
    x0 = jnp.zeros((8, 128), jnp.float32)
    assert np.all(np.asarray(fused_l2_normalize(x0, True)) == 0.0)
    g0 = jax.grad(lambda x: jnp.sum(fused_l2_normalize(x, True)))(x0)
    assert np.all(np.isfinite(np.asarray(g0)))


def test_decoder_dispatches_fused_l2_normalize(monkeypatch):
    """bf16 + TPU backend + native resolution -> the field kernel output
    (interpret mode) must match the XLA normalize the CPU path produces."""
    from jax.experimental.pallas import tpu as pltpu
    from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig

    cfg = DepthUNetConfig(
        encoder_filters=(8, 16, 16, 16, 32), embedding_dim=128,
        use_batch_norm=True, dtype=jnp.bfloat16,
    )
    model = DepthUNet(cfg)
    depth = jax.random.normal(jax.random.key(0), (8, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.key(1), depth, train=False)

    field_cpu = model.apply(variables, depth,
                            method=DepthUNet.forward_native)[0]
    monkeypatch.setenv("RANGECLIP_PLATFORM", "tpu")
    with pltpu.force_tpu_interpret_mode():
        field_tpu = model.apply(variables, depth,
                                method=DepthUNet.forward_native)[0]
    monkeypatch.delenv("RANGECLIP_PLATFORM")
    np.testing.assert_allclose(
        np.asarray(field_tpu, np.float32), np.asarray(field_cpu, np.float32),
        rtol=2e-2, atol=2e-2)


def test_fused_ce_packed_contrast_matches_full():
    """Packed-contrast CE: scoring the gathered [K, D] member table with
    global ids compared in-kernel equals the full-C masked kernel (same
    member columns, reduction order over K vs C lanes is the only
    difference), values and grads, flat and slot labels."""
    from rangeclip_tpu.losses.infonce import pack_contrast_set
    from rangeclip_tpu.ops.pallas.pixel_text_ce import fused_pixel_text_ce

    rng = np.random.default_rng(21)
    N, D, C, K, S = 256, 32, 64, 32, 2
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    text_n = l2_normalize(text, axis=-1)
    t0 = jnp.float32(0.07)

    for slots in (False, True):
        shape = (S, N) if slots else (N,)
        labels = jnp.asarray(rng.integers(1, 20, shape), jnp.int32)
        valid = jnp.asarray((rng.random(shape) > 0.3), jnp.float32)
        mask = np.zeros(C, bool)
        mask[np.unique(np.asarray(labels))] = True
        mask[rng.choice(C, 8, replace=False)] = True
        assert mask.sum() <= K
        mask = jnp.asarray(mask)
        ids, table, pmask = pack_contrast_set(mask, text_n, K)
        # padded slots: sentinel id C, mask 0, ids ascending
        assert int(jnp.sum(pmask)) == int(jnp.sum(mask))
        np.testing.assert_array_equal(
            np.asarray(ids[pmask]), np.flatnonzero(np.asarray(mask)))
        assert np.all(np.asarray(ids[~pmask]) == C)

        s = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

        def full(s, t):
            return fused_pixel_text_ce(s, t, labels, valid, text_n, mask,
                                       64, True)

        def packed(s, t):
            return fused_pixel_text_ce(s, t, labels, valid, table, pmask,
                                       64, True, ids)

        np.testing.assert_allclose(float(packed(s, t0)), float(full(s, t0)),
                                   rtol=1e-6)
        ga = jax.grad(full, argnums=(0, 1))(s, t0)
        gb = jax.grad(packed, argnums=(0, 1))(s, t0)
        # K-lane vs C-lane f32 reduction order: ~1e-7-scale differences
        np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(ga[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(gb[1]), float(ga[1]), rtol=1e-5)


def test_pixel_text_infonce_packed_dispatch_and_overflow(monkeypatch):
    """The TPU dispatch packs when the live contrast set fits the capacity
    and lax.cond-falls-back to the full kernel when it overflows — the
    loss value (and grads) must match the capacity-None path either way."""
    import rangeclip_tpu.ops.pallas.pixel_text_ce as ce_mod
    from rangeclip_tpu.losses.infonce import pixel_text_infonce

    real = ce_mod.fused_pixel_text_ce

    def interp(s, t, labels, valid, text, mask, tile_n=512, interpret=False,
               class_ids=None):
        return real(s, t, labels, valid, text, mask, tile_n, True, class_ids)

    monkeypatch.setattr(ce_mod, "fused_pixel_text_ce", interp)
    monkeypatch.setenv("RANGECLIP_PLATFORM", "tpu")

    rng = np.random.default_rng(5)
    N, D, C = 256, 32, 160  # capacity rounds up to 128 < C
    s = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    text = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 20, N), jnp.int32)
    valid = jnp.asarray((rng.random(N) > 0.3), jnp.float32)
    t0 = jnp.float32(0.07)

    for overflow in (False, True):
        mask = np.zeros(C, bool)
        mask[np.unique(np.asarray(labels))] = True
        if overflow:
            mask[:] = True  # 160 members > K=128 -> cond takes full branch
        mask = jnp.asarray(mask)

        def with_cap(s):
            return pixel_text_infonce(s, labels, valid, text, mask, t0,
                                      contrast_capacity=96)

        def no_cap(s):
            return pixel_text_infonce(s, labels, valid, text, mask, t0)

        va, vb = float(with_cap(s)), float(no_cap(s))
        if overflow:
            assert va == vb  # same branch, bitwise
        else:
            np.testing.assert_allclose(va, vb, rtol=1e-5)
        ga = jax.grad(lambda x: with_cap(x).astype(jnp.float32))(s)
        gb = jax.grad(lambda x: no_cap(x).astype(jnp.float32))(s)
        np.testing.assert_allclose(
            np.asarray(ga, np.float32), np.asarray(gb, np.float32),
            rtol=2e-2, atol=1e-6)


def test_fused_ce_4d_vs_flat_bit_equal_at_common_tile(monkeypatch):
    """Demonstrates the accumulation-order rationale behind the 5e-6
    tolerance in test_fused_ce_4d_field_path_matches_flat (VERDICT r4 #8):
    the 4-D and flat paths differ ONLY in row-tile width (rh*W vs tile_n),
    and the class-major backward's d_emb contraction (delta [C, TN] x
    text [C, D]) is blocked per tile width.  Forcing BOTH paths to the
    same 256-row tiles makes the grads return to BIT-EQUALITY — so the
    production-tile divergence is accumulation order, not a math bug, and
    a real grad defect under 5e-6 would still be caught here."""
    from rangeclip_tpu.ops.pallas.pixel_text_ce import (
        _rows_per_block,
        fused_pixel_text_ce,
    )

    monkeypatch.setenv("RANGECLIP_CE_ROWS_FWD", "2")
    monkeypatch.setenv("RANGECLIP_CE_ROWS_BWD", "2")

    rng = np.random.default_rng(6)
    B, H, W, D, C = 2, 4, 128, 16, 24
    assert _rows_per_block(H, W, prefer=2) == 2  # rh*W == 256 == tile_n
    x4 = jnp.asarray(rng.standard_normal((B, H, W, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 10, B * H * W), jnp.int32)
    valid = jnp.asarray((rng.random(B * H * W) > 0.3), jnp.float32)
    text_n = l2_normalize(
        jnp.asarray(rng.standard_normal((C, D)), jnp.float32), axis=-1
    )
    mask = jnp.ones(C, bool)

    def f(s, t):
        return fused_pixel_text_ce(s, t, labels, valid, text_n, mask, 256,
                                   True)

    t0 = jnp.float32(0.07)
    assert float(f(x4, t0)) == float(f(x4.reshape(-1, D), t0))
    g4 = jax.grad(f, argnums=(0, 1))(x4, t0)
    g2 = jax.grad(f, argnums=(0, 1))(x4.reshape(-1, D), t0)
    np.testing.assert_array_equal(
        np.asarray(g4[0]).reshape(-1, D), np.asarray(g2[0]))
    assert float(g4[1]) == float(g2[1])


def test_fused_conv_score_topk_matches_folded_pair():
    """The round-5 fused conv+selection kernel (conv_score_topk.py — the
    bf16 B%128 predict_folded fast path) is bit-equal in interpret mode
    to the two-program formulation it replaces: XLA SAME-conv -> bf16
    scores -> packed fused_score_topk, including dead (-1) slots, the
    id tie-break, and the values decode."""
    from rangeclip_tpu.ops.pallas.conv_score_topk import (
        fused_conv_score_topk,
        fused_conv_topk_applicable,
    )
    from rangeclip_tpu.ops.pallas.score_topk import fused_score_topk

    rng = np.random.default_rng(0)
    B, h, w, Cin, S, K = 8, 4, 16, 8, 128, 5
    feats = jnp.asarray(rng.standard_normal((B, h, w, Cin)),
                        jnp.float32).astype(jnp.bfloat16)
    fold = jnp.asarray(rng.standard_normal((3, 3, Cin, S)),
                       jnp.float32).astype(jnp.bfloat16)
    ids = jnp.arange(S, dtype=jnp.int32).at[-7:].set(-1)

    scores = jax.lax.conv_general_dilated(
        feats, fold, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    field_t = jnp.transpose(scores, (1, 2, 0, 3))
    idx_ref, val_ref = fused_score_topk(
        field_t, ids, top_k=K, want_values=True, interpret=True,
        max_id=S - 1)

    idx_f, val_f = fused_conv_score_topk(
        feats, fold, ids, top_k=K, want_values=True, interpret=True,
        slice_cols=4)
    np.testing.assert_array_equal(np.asarray(idx_f).T, np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(val_f).T, np.asarray(val_ref))

    # the dispatch gate: engaged exactly at the kernel's layout contract
    assert fused_conv_topk_applicable((128, 128, 128, 32), 384, 383)
    assert not fused_conv_topk_applicable((8, 128, 128, 32), 384, 383)
    assert not fused_conv_topk_applicable((128, 128, 128, 32), 384, None)
    assert not fused_conv_topk_applicable((128, 128, 128, 32), 384, 2 ** 16)
