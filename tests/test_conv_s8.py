"""Pallas int8 conv kernel vs the XLA quant._conv_requant oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu import quant as Q
from mv3d_tf_tpu.ops.conv_s8_pallas import (conv2x2_s8_pallas,
                                            conv3x3_s8_pallas,
                                            conv3x3_s8_pallas_v2,
                                            matmul_s8_pallas)


def _rand_case(rng, B, H, W, C, K):
    x = rng.randint(0, 128, (B, H, W, C)).astype(np.int8)
    w = rng.randint(-127, 128, (3, 3, C, K)).astype(np.int8)
    k = (rng.rand(K) * 2e-3 + 1e-4).astype(np.float32)
    b = (rng.rand(K) - 0.5).astype(np.float32)
    return x, w, k, b


def _oracle(x, w, k, b, out_dtype=jnp.int8):
    y32 = Q._conv_s8(jnp.asarray(x), jnp.asarray(w))
    y = y32.astype(jnp.float32) * k + b
    if out_dtype == jnp.int8:
        return np.asarray(jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8))
    return np.asarray(jnp.maximum(y, 0.0))


@pytest.mark.parametrize("kernel", [conv3x3_s8_pallas,
                                    conv3x3_s8_pallas_v2])
@pytest.mark.parametrize("shape", [
    (1, 8, 7, 128, 128),      # W not a sublane multiple, tiny rows
    (2, 19, 33, 128, 256),    # H not divisible by tile_rows
    (1, 16, 76, 256, 128),    # conv4/5-ish width
])
def test_conv_s8_pallas_matches_oracle(shape, kernel):
    rng = np.random.RandomState(0)
    B, H, W, C, K = shape
    x, w, k, b = _rand_case(rng, B, H, W, C, K)
    ref = _oracle(x, w, k, b)
    got = np.asarray(kernel(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(k), jnp.asarray(b),
        tile_rows=8, interpret=True))
    assert got.shape == ref.shape
    # s32 accumulation + f32 epilogue are exact; only the round-to-int
    # at EXACT .5 boundaries could differ, and jnp.round is used by both
    assert (got == ref).all(), np.abs(
        got.astype(np.int32) - ref.astype(np.int32)).max()


@pytest.mark.parametrize("kernel", [conv3x3_s8_pallas,
                                    conv3x3_s8_pallas_v2])
def test_conv_s8_pallas_f32_out(kernel):
    rng = np.random.RandomState(1)
    x, w, k, b = _rand_case(rng, 1, 10, 12, 128, 128)
    ref = _oracle(x, w, k, b, out_dtype=jnp.float32)
    got = np.asarray(kernel(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(k), jnp.asarray(b),
        tile_rows=5, interpret=True, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (1, 9, 9, 128, 128),      # tiny, W-1 not a sublane multiple
    (2, 21, 14, 256, 256),    # packed-stem channel count, odd rows
])
def test_conv2x2_s8_pallas_matches_oracle(shape):
    rng = np.random.RandomState(4)
    B, H, W, C, K = shape
    x = rng.randint(0, 128, (B, H, W, C)).astype(np.int8)
    w = rng.randint(-127, 128, (2, 2, C, K)).astype(np.int8)
    k = (rng.rand(K) * 2e-3 + 1e-4).astype(np.float32)
    b = (rng.rand(K) - 0.5).astype(np.float32)
    y32 = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    ref = np.asarray(jnp.clip(jnp.round(
        y32.astype(jnp.float32) * k + b), 0, 127).astype(jnp.int8))
    got = np.asarray(conv2x2_s8_pallas(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(k), jnp.asarray(b),
        tile_rows=4, interpret=True))
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_matmul_s8_pallas_matches_dot():
    rng = np.random.RandomState(2)
    a = rng.randint(-127, 128, (1024, 2048)).astype(np.int8)
    b = rng.randint(-127, 128, (2048, 512)).astype(np.int8)
    ref = np.asarray(jax.lax.dot_general(
        jnp.asarray(a), jnp.asarray(b), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    got = np.asarray(matmul_s8_pallas(jnp.asarray(a), jnp.asarray(b),
                                      bm=512, bk=1024, bn=512,
                                      interpret=True))
    assert (got == ref).all()


def test_trunk_int8_pallas_matches_xla():
    """conv_impl='pallas' vs 'xla' through quant.trunk_apply_int8_from_stem
    on a small stem output: identical int8 features (same _conv_requant
    math, s32-exact accumulation)."""
    from mv3d_tf_tpu.models import vgg
    from mv3d_tf_tpu.utils.weights import load_npy_weights  # noqa: F401
    rng = np.random.RandomState(3)
    params = {}
    c_in = 9
    for name, c_out, _ in vgg.VGG_LAYERS:
        params[name] = {
            "weights": jnp.asarray(
                rng.randn(3, 3, c_in, c_out).astype(np.float32) * 0.05),
            "biases": jnp.asarray(
                rng.rand(c_out).astype(np.float32) * 0.1)}
        c_in = c_out
    stem = jnp.asarray(rng.rand(1, 40, 24, 64).astype(np.float32) * 2)

    frames = rng.rand(1, 80, 48, 9).astype(np.float32)
    scales = Q.calibrate_trunk(params, frames)
    qtrunk = Q.quantize_trunk(params, scales)

    f_xla, s_xla = Q.trunk_apply_int8_from_stem(qtrunk, stem,
                                                conv_impl="xla")
    f_pal, s_pal = Q.trunk_apply_int8_from_stem(qtrunk, stem,
                                                conv_impl="pallas")
    assert float(s_xla) == float(s_pal)
    assert (np.asarray(f_xla) == np.asarray(f_pal)).all()


def test_trunk_int8_hybrid_matches_xla():
    """conv_impl='hybrid' (Pallas at conv2/conv3 incl. the channel-
    padded conv2_1, XLA at conv4/conv5) is bit-identical to 'xla'
    through both from-stem entry points — zero-padded input channels
    contribute zero to the s32 accumulator."""
    from mv3d_tf_tpu.models import vgg
    rng = np.random.RandomState(4)
    params = {}
    c_in = 9
    for name, c_out, _ in vgg.VGG_LAYERS:
        params[name] = {
            "weights": jnp.asarray(
                rng.randn(3, 3, c_in, c_out).astype(np.float32) * 0.05),
            "biases": jnp.asarray(
                rng.rand(c_out).astype(np.float32) * 0.1)}
        c_in = c_out
    stem = jnp.asarray(rng.rand(1, 40, 24, 64).astype(np.float32) * 2)
    frames = rng.rand(1, 80, 48, 9).astype(np.float32)
    scales = Q.calibrate_trunk(params, frames)
    qtrunk = Q.quantize_trunk(params, scales)

    f_xla, s_xla = Q.trunk_apply_int8_from_stem(qtrunk, stem,
                                                conv_impl="xla")
    f_hyb, s_hyb = Q.trunk_apply_int8_from_stem(qtrunk, stem,
                                                conv_impl="hybrid")
    assert float(s_xla) == float(s_hyb)
    assert (np.asarray(f_xla) == np.asarray(f_hyb)).all()
    # already-quantized entry point (the s2d_int8 stem path)
    s = qtrunk["conv1_2"]["s_out"]
    stem_q = jnp.clip(jnp.round(stem.astype(jnp.float32) / s),
                      0, 127).astype(jnp.int8)
    g_xla, _ = Q.trunk_apply_int8_from_stem_q(qtrunk, stem_q,
                                              conv_impl="xla")
    g_hyb, _ = Q.trunk_apply_int8_from_stem_q(qtrunk, stem_q,
                                              conv_impl="hybrid")
    assert (np.asarray(g_xla) == np.asarray(g_hyb)).all()


def _shipping_s8_conv_shapes():
    """Every (H, W, C, K, taps) the detect fast path can hand the Pallas
    s8 kernels, derived by the same shape arithmetic as the stem + trunk
    (quant.extract_features_int8 / _s2d_stem_int8 / trunk_apply_*):
    BEV 601x601 and image 384x1248 views, s2d + s2d_int8 stems, plus the
    RPN 3x3 conv. Only convs with C and K multiples of 128 reach the
    kernels (quant.py dispatch)."""
    from mv3d_tf_tpu.models import vgg
    shapes = []
    for H0, W0 in ((601, 601), (384, 1248)):
        Ho, Wo = H0 // 2, W0 // 2
        # s2d_int8 stem: packed conv1_2 runs as the 2x2 VALID kernel on
        # the (Ho+1, Wo+1, 256) conv1_1 output (stem_s2d shifted packing)
        shapes.append((Ho + 1, Wo + 1, 256, 256, 2))
        # trunk after the stem (conv2_1 is 64->128: XLA, not Pallas)
        h, w = Ho, Wo
        c = 128
        for name, c_out, pool in vgg.VGG_LAYERS[2:]:
            if c % 128 == 0 and c_out % 128 == 0:
                shapes.append((h, w, c, c_out, 3))
            c = c_out
            if pool:
                h, w = h // 2, w // 2
        # RPN 3x3 conv (512 -> 512) on the final feature map
        shapes.append((h, w, 512, 512, 3))
    return shapes


def test_s8_tile_rows_fit_all_shipping_shapes():
    """quant._s8_tile_rows must pick a tile whose full kernel working
    set fits scoped VMEM for EVERY shape the fast path ships — a budget
    regression must fail here, not at run time on the chip (VERDICT r2
    weak #8). 14 MB leaves headroom under the 16 MB scoped limit for
    Mosaic's own spills."""
    from mv3d_tf_tpu.ops.conv_s8_pallas import s8_conv_vmem_bytes

    for H, W, C, K, taps in _shipping_s8_conv_shapes():
        tr = Q._s8_tile_rows(H, W=W, C=C, K=K)
        used = s8_conv_vmem_bytes(H, W, C, K, tr, taps=taps)
        assert used <= 14 * 1024 * 1024, (
            (H, W, C, K, taps), tr, used)
        # grid must cover H exactly or pad: padding wastes compute, so
        # the divisor preference should hold whenever a fitting divisor
        # exists
        fitting = [t for t in range(2, 13) if H % t == 0 and
                   s8_conv_vmem_bytes(H, W, C, K, t, taps=taps)
                   <= 14 * 1024 * 1024]
        if fitting:
            assert H % tr == 0, ((H, W, C, K), tr, fitting)


def test_s8_tile_rows_image_view_capped():
    """The 624-px image rows at 512 channels overflow a TH=8 tile
    (measured 18.57 MB r2) — the heuristic must cap TH there."""
    from mv3d_tf_tpu.ops.conv_s8_pallas import s8_conv_vmem_bytes
    tr = Q._s8_tile_rows(48, W=156, C=512, K=512)
    assert s8_conv_vmem_bytes(48, 156, 512, 512, tr) <= 14 * 1024 * 1024
    tr_wide = Q._s8_tile_rows(96, W=312, C=256, K=256)
    assert s8_conv_vmem_bytes(96, 312, 256, 256, tr_wide) <= 14 * 1024 * 1024
