"""Int8 PTQ path: weight quantization, calibration, int8 trunk/head
accuracy vs the float reference (VERDICT r1 next-round #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu import quant as Q
from mv3d_tf_tpu.models import mv3d, vgg


def test_quantize_weights_roundtrip(rng):
    w = rng.randn(3, 3, 16, 8).astype(np.float32)
    w_q, s = Q.quantize_weights(w)
    assert w_q.dtype == np.int8 and s.shape == (8,)
    # dequantized weights within one step of the originals
    err = np.abs(w_q.astype(np.float32) * s - w)
    assert (err <= s[None, None, None, :] * 0.5 + 1e-7).all()
    # max-magnitude weight maps to +-127
    assert np.abs(w_q).max() == 127


@pytest.fixture(scope="module")
def small_params():
    # module-scoped: init_params builds the ~400 MB fc stack (~14 s on
    # this CPU) — once per file, not once per test; no test mutates it
    key = jax.random.PRNGKey(0)
    params = mv3d.init_params(key)
    # bump weights so activations have healthy dynamic range
    for name, _, _ in vgg.VGG_LAYERS:
        for sfx in ("", "_2"):
            p = params[name + sfx]
            p["weights"] = p["weights"] * 5.0
            p["biases"] = p["biases"] + 0.01
    return params


def test_int8_trunk_tracks_float(small_params, rng):
    params = small_params
    x = rng.rand(2, 40, 48, 9).astype(np.float32)
    scales = Q.calibrate_trunk(params, x, suffix="")
    qtrunk = Q.quantize_trunk(params, scales, suffix="")

    feat_q, s_out = Q.trunk_apply_int8(qtrunk, jnp.asarray(x))
    assert feat_q.dtype == jnp.int8
    feat_int8 = np.asarray(feat_q, np.float32) * float(s_out)

    feat_ref = np.asarray(vgg.trunk_apply(params, jnp.asarray(x),
                                          suffix=""), np.float32)
    assert feat_ref.std() > 0
    # int8 quantization noise accumulates over 13 layers; demand high
    # correlation and small relative error, not bit equality
    denom = np.abs(feat_ref).max()
    rel = np.abs(feat_int8 - feat_ref).max() / max(denom, 1e-6)
    assert rel < 0.15, rel
    corr = np.corrcoef(feat_int8.ravel(), feat_ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_int8_trunk_from_stem_matches_full(small_params, rng):
    """Entering after conv1_2+pool1 (the stem path) must agree with the
    full int8 trunk entered at the input."""
    params = small_params
    x = rng.rand(1, 40, 48, 9).astype(np.float32)
    scales = Q.calibrate_trunk(params, x, suffix="")
    qtrunk = Q.quantize_trunk(params, scales, suffix="")

    full_q, s1 = Q.trunk_apply_int8(qtrunk, jnp.asarray(x))

    # bf16 stem reference (conv1_1, conv1_2, pool)
    h = jnp.asarray(x).astype(jnp.bfloat16)
    for name in ("conv1_1", "conv1_2"):
        p = params[name]
        h = vgg.conv2d(h, p["weights"], p["biases"], dtype=jnp.bfloat16)
    h = vgg.max_pool_2x2_valid(h)
    stem_q, s2 = Q.trunk_apply_int8_from_stem(qtrunk, h)

    assert float(s1) == float(s2)
    a = np.asarray(full_q, np.float32) * float(s1)
    b = np.asarray(stem_q, np.float32) * float(s2)
    denom = max(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 0.2


def test_int8_head_tracks_float(small_params, rng):
    params = small_params
    pooled_bv = jnp.asarray(rng.rand(12, 7, 7, 512).astype(np.float32))
    pooled_img = jnp.asarray(rng.rand(12, 7, 7, 512).astype(np.float32))
    head_scales = Q.calibrate_head(params, pooled_bv, pooled_img)
    qhead = Q.quantize_head(params, head_scales)

    s_bv = float(head_scales["pooled_bv"])
    s_img = float(head_scales["pooled_img"])
    bv_q = jnp.clip(jnp.round(pooled_bv / s_bv), 0, 127).astype(jnp.int8)
    img_q = jnp.clip(jnp.round(pooled_img / s_img), 0, 127).astype(jnp.int8)

    _, prob_q, bbox_q = Q.fusion_head_int8(params, qhead, bv_q, s_bv,
                                           img_q, s_img)
    _, prob_f, bbox_f = mv3d.fusion_head(params, pooled_bv, pooled_img,
                                         dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(prob_q), np.asarray(prob_f),
                               atol=0.1)


def test_build_quant_state_and_batch_detector(small_params, rng):
    """The quantized batch detector runs end-to-end and its valid
    detections overlap the float detector's (tiny shapes, CPU)."""
    from mv3d_tf_tpu.eval import build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))

    from mv3d_tf_tpu.eval import PIXEL_MEANS
    qs = Q.build_quant_state(params, bev, image - PIXEL_MEANS)
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50, post_nms_top_n=10)
    det_q = build_detect_batch_fn(quant=qs, **kwargs)(
        params, bev, image, calib)
    det_f = build_detect_batch_fn(**kwargs)(params, bev, image, calib)
    assert np.asarray(det_q["scores"]).shape == \
        np.asarray(det_f["scores"]).shape
    assert np.isfinite(np.asarray(det_q["scores"])).all()
    # both paths emit the same number of valid slots (same NMS budget)
    assert np.asarray(det_q["valid"]).sum() > 0


def test_quant_with_int8_head_and_s2d_stem(small_params, rng):
    """Pooled-feature calibration -> int8 fc6/fc7 head + s2d stem through
    the batch detector: runs end-to-end, probabilities track the float
    path's shape and stay finite (tiny shapes, CPU)."""
    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))

    img_ms = image - PIXEL_MEANS
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=12)
    pool_bv, pool_img = Q.calibrate_pooled_features(
        params, bev, img_ms, calib, feat_h=10, feat_w=10,
        post_nms_top_n=12)
    assert pool_bv.ndim == 4 and pool_img.ndim == 4
    qs = Q.build_quant_state(params, bev, img_ms, pooled_bv=pool_bv,
                             pooled_img=pool_img)
    assert qs["head"] is not None
    det_q = build_detect_batch_fn(quant=qs, stem_impl="s2d", **kwargs)(
        params, bev, image, calib)
    assert np.isfinite(np.asarray(det_q["scores"])).all()
    assert np.asarray(det_q["valid"]).sum() > 0


def test_s2d_int8_stem_tracks_bf16_stem(small_params, rng):
    """The fully-int8 s2d stem (packed conv1_2 s8 + group max) tracks
    the bf16 stem + requantize path within quantization noise."""
    params = small_params
    x = rng.rand(1, 40, 48, 9).astype(np.float32)
    scales = Q.calibrate_trunk(params, x)
    qtrunk = Q.quantize_trunk(params, scales)

    stem_bf16 = Q._bf16_stem(params, jnp.asarray(x))
    s2 = float(qtrunk["conv1_2"]["s_out"])
    ref_q = np.asarray(jnp.clip(jnp.round(
        stem_bf16.astype(jnp.float32) / s2), 0, 127).astype(jnp.int8))

    got_q, s_out = Q._s2d_stem_int8(params, qtrunk, jnp.asarray(x))
    assert float(s_out) == s2
    got_q = np.asarray(got_q)
    assert got_q.shape == ref_q.shape
    # int8 grids: allow off-by-a-few codes from the extra Y1
    # quantization; the bulk must match closely
    diff = np.abs(got_q.astype(np.int32) - ref_q.astype(np.int32))
    assert np.mean(diff <= 1) > 0.97, (diff.mean(), diff.max())


def test_detector_s2d_int8_stem_runs(small_params, rng):
    """End-to-end batch detector with stem_impl='s2d_int8'."""
    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))
    qs = Q.build_quant_state(params, bev, image - PIXEL_MEANS)
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=12)
    det_q = build_detect_batch_fn(quant=qs, stem_impl="s2d_int8",
                                  **kwargs)(params, bev, image, calib)
    assert np.isfinite(np.asarray(det_q["scores"])).all()
    assert np.asarray(det_q["valid"]).sum() > 0


def test_rpn_head_int8_tracks_float(small_params, rng):
    """int8 RPN 3x3 conv + bf16 1x1 heads tracks the bf16 rpn_head."""
    from mv3d_tf_tpu.models import mv3d
    params = small_params
    feat = rng.rand(1, 10, 12, 512).astype(np.float32) * 2
    s = float(np.abs(feat).max() / 127.0)
    feat_q = np.clip(np.round(feat / s), 0, 127).astype(np.int8)
    cls_q, box_q = Q.rpn_head_int8(params, jnp.asarray(feat_q),
                                   jnp.float32(s))
    cls_f, box_f = mv3d.rpn_head(params, jnp.asarray(feat),
                                 dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(cls_q, np.float32),
                               np.asarray(cls_f, np.float32),
                               rtol=0.2, atol=0.15)
    assert np.isfinite(np.asarray(box_q)).all()


def test_detector_quant_rpn_runs(small_params, rng):
    """End-to-end batch detector with quant_rpn=True (no dequantized
    trunk map materialized)."""
    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))
    qs = Q.build_quant_state(params, bev, image - PIXEL_MEANS)
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=12)
    det_q = build_detect_batch_fn(quant=qs, quant_rpn=True,
                                  **kwargs)(params, bev, image, calib)
    assert np.isfinite(np.asarray(det_q["scores"])).all()
    assert np.asarray(det_q["valid"]).sum() > 0


def test_quant_state_roundtrip(small_params, rng):
    """save_quant_state/load_quant_state: real PTQ state survives a
    .npz round-trip (dtypes, scalars, None head) and the loaded state
    drives the detector identically."""
    import os
    import tempfile
    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))
    qs = Q.build_quant_state(params, bev, image - PIXEL_MEANS)
    path = tempfile.mktemp(suffix=".npz")
    try:
        Q.save_quant_state(path, qs)
        got = Q.load_quant_state(path)
        assert got["head"] is None
        assert got["trunk_bv"]["conv5_3"]["w_q"].dtype == jnp.int8
        kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                      post_nms_top_n=10)
        d1 = build_detect_batch_fn(quant=qs, **kwargs)(
            params, bev, image, calib)
        d2 = build_detect_batch_fn(quant=got, **kwargs)(
            params, bev, image, calib)
        np.testing.assert_array_equal(np.asarray(d1["scores"]),
                                      np.asarray(d2["scores"]))
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_conv_s8_dots_bit_exact(rng):
    """_conv_s8_dots (9 shifted s8 matmuls) is bit-identical to the XLA
    s8 conv — integer arithmetic, no rounding anywhere."""
    x = jnp.asarray(rng.randint(-128, 128, (2, 13, 17, 64)).astype(np.int8))
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 64, 128)).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(Q._conv_s8_dots(x, w)),
                                  np.asarray(Q._conv_s8(x, w)))


def test_conv_s8_im2col_bit_exact(rng):
    """_conv_s8_im2col (one (BHW, 9C) s8 matmul) is bit-identical to the
    XLA s8 conv — integer arithmetic, contraction order (dy, dx, ci)
    matches w_q.reshape(9*C, K)."""
    x = jnp.asarray(rng.randint(-128, 128, (2, 13, 17, 64)).astype(np.int8))
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, 64, 128)).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(Q._conv_s8_im2col(x, w)),
                                  np.asarray(Q._conv_s8(x, w)))


def test_trunk_conv_impl_im2col_matches_xla(small_params, rng):
    """conv_impl="im2col" through the whole int8 trunk equals the XLA
    path bit-for-bit (same requant epilogue on identical s32 sums)."""
    params = small_params
    x = rng.rand(1, 40, 40, 9).astype(np.float32)
    qtrunk = Q.calibrate_trunk(params, jnp.asarray(x))
    qt = Q.quantize_trunk(params, qtrunk)
    stem = Q._bf16_stem(params, jnp.asarray(x))
    f_xla, _ = Q.trunk_apply_int8_from_stem(qt, stem, conv_impl="xla")
    f_im, s_im = Q.trunk_apply_int8_from_stem(qt, stem, conv_impl="im2col")
    np.testing.assert_array_equal(np.asarray(f_xla), np.asarray(f_im))


def test_trunk_conv_impl_dots_matches_xla(small_params, rng):
    """conv_impl="dots" through the whole int8 trunk equals the XLA
    path bit-for-bit (same requant epilogue on identical s32 sums)."""
    params = small_params
    x = rng.rand(1, 40, 40, 9).astype(np.float32)
    qtrunk = Q.calibrate_trunk(params, jnp.asarray(x))
    qt = Q.quantize_trunk(params, qtrunk)
    stem = Q._bf16_stem(params, jnp.asarray(x))
    f_xla, s_xla = Q.trunk_apply_int8_from_stem(qt, stem, conv_impl="xla")
    f_dot, s_dot = Q.trunk_apply_int8_from_stem(qt, stem, conv_impl="dots")
    assert float(s_xla) == float(s_dot)
    np.testing.assert_array_equal(np.asarray(f_xla), np.asarray(f_dot))


def test_quant_pool_false_matches_s8_pool(small_params, rng):
    """quant_pool=False (dequantized bf16 pool/head tail — the fused-
    graph fault dodge, eval.py) must track the s8-pool path: max
    commutes with the monotone dequant, so scores should agree to bf16
    noise (tiny shapes, CPU)."""
    from mv3d_tf_tpu.eval import build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))

    from mv3d_tf_tpu.eval import PIXEL_MEANS
    qs = Q.build_quant_state(params, bev, image - PIXEL_MEANS)
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50, post_nms_top_n=10)
    det_a = build_detect_batch_fn(quant=qs, **kwargs)(
        params, bev, image, calib)
    det_b = build_detect_batch_fn(quant=qs, quant_pool=False, **kwargs)(
        params, bev, image, calib)
    va = np.asarray(det_a["valid"])
    vb = np.asarray(det_b["valid"])
    np.testing.assert_array_equal(va, vb)
    both = va & vb
    sa = np.asarray(det_a["scores"])[both]
    sb = np.asarray(det_b["scores"])[both]
    assert np.abs(sa - sb).max() < 0.02, np.abs(sa - sb).max()


def test_quant_pool_false_with_int8_head(small_params, rng):
    """quant_pool=False + int8 head: the pooled bf16 features are
    requantized at the trunk output scale and fed to the s8 head —
    runs end-to-end, finite, and tracks the s8-pool int8-head path."""
    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    params = small_params
    B = 2
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    import __graft_entry__ as graft
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))

    img_ms = image - PIXEL_MEANS
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=12)
    pool_bv, pool_img = Q.calibrate_pooled_features(
        params, bev, img_ms, calib, feat_h=10, feat_w=10,
        post_nms_top_n=12)
    qs = Q.build_quant_state(params, bev, img_ms, pooled_bv=pool_bv,
                             pooled_img=pool_img)
    det_a = build_detect_batch_fn(quant=qs, **kwargs)(
        params, bev, image, calib)
    det_b = build_detect_batch_fn(quant=qs, quant_pool=False, **kwargs)(
        params, bev, image, calib)
    np.testing.assert_array_equal(np.asarray(det_a["valid"]),
                                  np.asarray(det_b["valid"]))
    both = np.asarray(det_a["valid"]) & np.asarray(det_b["valid"])
    sa = np.asarray(det_a["scores"])[both]
    sb = np.asarray(det_b["scores"])[both]
    assert np.abs(sa - sb).max() < 0.05, np.abs(sa - sb).max()
