"""Space-to-depth stem vs the literal conv1_1+conv1_2+pool1 stem."""

import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu.models import vgg
from mv3d_tf_tpu.ops.stem_s2d import stem_s2d


def _literal_stem(x, w1, b1, w2, b2, dtype=None):
    y = vgg.conv2d(x, w1, b1, dtype=dtype)
    y = vgg.conv2d(y, w2, b2, dtype=dtype)
    return vgg.max_pool_2x2_valid(y)


def _case(rng, B, H, W, Cin, C1=64, C2=64):
    x = rng.rand(B, H, W, Cin).astype(np.float32) * 2 - 0.5
    w1 = (rng.randn(3, 3, Cin, C1) * 0.1).astype(np.float32)
    b1 = (rng.rand(C1) * 0.1).astype(np.float32)
    w2 = (rng.randn(3, 3, C1, C2) * 0.1).astype(np.float32)
    b2 = (rng.rand(C2) * 0.1).astype(np.float32)
    return tuple(map(jnp.asarray, (x, w1, b1, w2, b2)))


@pytest.mark.parametrize("shape", [
    (1, 21, 17, 9),    # odd/odd (BEV 601x601 class)
    (2, 16, 24, 3),    # even/even (image 384x1248 class)
    (1, 15, 16, 9),    # odd/even mix
])
def test_stem_s2d_matches_literal_f32(shape):
    rng = np.random.RandomState(0)
    args = _case(rng, *shape)
    ref = np.asarray(_literal_stem(*args))
    got = np.asarray(stem_s2d(*args))
    assert got.shape == ref.shape
    # identical multiply-adds (plus exact zeros) in f32/HIGHEST — only
    # summation order differs
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_stem_s2d_matches_literal_bf16():
    rng = np.random.RandomState(1)
    args = _case(rng, 1, 20, 22, 9)
    ref = np.asarray(_literal_stem(*args, dtype=jnp.bfloat16),
                     np.float32)
    got = np.asarray(stem_s2d(*args, dtype=jnp.bfloat16), np.float32)
    # bf16 reduction-order noise only
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


def test_stem_s2d_grad_flows():
    import jax
    rng = np.random.RandomState(2)
    x, w1, b1, w2, b2 = _case(rng, 1, 12, 14, 9, C1=8, C2=8)

    def loss_s2d(w1, b1, w2, b2):
        return jnp.sum(stem_s2d(x, w1, b1, w2, b2) ** 2)

    def loss_lit(w1, b1, w2, b2):
        return jnp.sum(_literal_stem(x, w1, b1, w2, b2) ** 2)

    g_s2d = jax.grad(loss_s2d, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    g_lit = jax.grad(loss_lit, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    for a, b in zip(g_s2d, g_lit):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
