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
