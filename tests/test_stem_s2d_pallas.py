"""Fused Pallas s2d stem (ops/stem_s2d_pallas.py) vs the XLA s2d stem
(ops/stem_s2d.py) — interpret-mode parity on CPU + the VMEM-fit model
over every shipping shape (real-chip check lives in tools/tpu_selfcheck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu.ops.stem_s2d import stem_s2d
from mv3d_tf_tpu.ops.stem_s2d_pallas import stem_s2d_fused, stem_tile_rows


def _params(rng, cin, c1=64, c2=64):
    w1 = rng.randn(3, 3, cin, c1).astype(np.float32) * 0.1
    b1 = rng.randn(c1).astype(np.float32) * 0.1
    w2 = rng.randn(3, 3, c1, c2).astype(np.float32) * 0.05
    b2 = rng.randn(c2).astype(np.float32) * 0.1
    return w1, b1, w2, b2


@pytest.mark.parametrize("H,W,Cin", [
    (26, 26, 9),     # even/even
    (25, 21, 9),     # odd/odd (the BEV 601 parity class)
    (24, 34, 3),     # image channel count, even dims
    (27, 20, 3),     # odd/even mix
])
def test_fused_matches_xla_s2d_f32(H, W, Cin):
    rng = np.random.RandomState(0)
    x = rng.randn(2, H, W, Cin).astype(np.float32)
    w1, b1, w2, b2 = _params(rng, Cin)
    ref = stem_s2d(x, w1, b1, w2, b2)                       # f32 HIGHEST
    got = stem_s2d_fused(x, w1, b1, w2, b2, dtype=jnp.float32,
                         interpret=True)
    assert got.shape == ref.shape == (2, H // 2, W // 2, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_close():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 26, 22, 9).astype(np.float32)
    w1, b1, w2, b2 = _params(rng, 9)
    ref = np.asarray(stem_s2d(x, w1, b1, w2, b2)).astype(np.float32)
    got = np.asarray(stem_s2d_fused(x, w1, b1, w2, b2,
                                    dtype=jnp.bfloat16,
                                    interpret=True)).astype(np.float32)
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 0.05


def test_tile_rows_fit_shipping_shapes():
    # the kernel must have a legal tile for every detect-path input
    # (BEV 601^2x9, image 384x1248x3) and the selfcheck/test shapes
    for H, W, Cin in [(601, 601, 9), (384, 1248, 3), (26, 26, 9),
                      (300, 300, 9), (192, 624, 3)]:
        tz = stem_tile_rows(H, W, Cin)
        assert (H // 2) % tz == 0
        assert 1 <= tz <= 32


def test_tile_rows_respects_budget():
    # shrinking the budget shrinks (or kills) the tile, never violates it
    tz_big = stem_tile_rows(384, 1248, 3)
    tz_small = stem_tile_rows(384, 1248, 3, budget=6 * 1024 * 1024)
    assert tz_small <= tz_big
