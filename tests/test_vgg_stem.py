"""Fused VGG stem Pallas kernel vs the XLA trunk stem (interpret mode;
real-TPU parity is covered by the benchmark path / test_roi_pool_tpu-style
subprocess checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu.models import vgg
from mv3d_tf_tpu.ops.vgg_stem_pallas import stem_tile_rows, vgg_stem_pallas


def _ref_stem(x, w1, b1, w2, b2):
    y = vgg.conv2d(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
                   dtype=jnp.bfloat16)
    y = vgg.conv2d(y, jnp.asarray(w2), jnp.asarray(b2), dtype=jnp.bfloat16)
    return np.asarray(vgg.max_pool_2x2_valid(y), np.float32)


@pytest.mark.parametrize("B,H,W,Cin,tr", [
    (2, 36, 40, 9, 2),     # BEV-like channels, multi-frame
    (1, 20, 132, 3, 5),    # image-like channels, wide
    (1, 21, 131, 9, 2),    # odd H and W (601-style edge handling)
])
def test_stem_matches_xla(rng, B, H, W, Cin, tr):
    x = rng.rand(B, H, W, Cin).astype(np.float32)
    w1 = (rng.rand(3, 3, Cin, 64).astype(np.float32) - 0.5) * 0.2
    b1 = rng.rand(64).astype(np.float32) * 0.1
    w2 = (rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.2
    b2 = rng.rand(64).astype(np.float32) * 0.1
    ref = _ref_stem(x, w1, b1, w2, b2)
    out = np.asarray(vgg_stem_pallas(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), tile_rows=tr, interpret=True),
        np.float32)
    assert out.shape == ref.shape
    # accumulation order differs -> one-ulp bf16 tolerance
    assert np.abs(ref - out).max() <= 2 ** -7 * np.abs(ref).max() + 1e-6


def test_stem_tile_rows():
    assert stem_tile_rows(300) == 10
    assert stem_tile_rows(192) == 8
    assert 300 % stem_tile_rows(300) == 0


def test_trunk_apply_fused_flag_matches(rng):
    """trunk_apply(fused_stem=True) == trunk_apply(False) through the
    full 13-layer trunk at a small shape (interpret-mode CPU run)."""
    from mv3d_tf_tpu.models import mv3d
    import jax
    import mv3d_tf_tpu.models.vgg as vggmod
    from mv3d_tf_tpu.ops import vgg_stem_pallas as sp

    params = mv3d.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(1, 24, 28, 9).astype(np.float32))
    ref = np.asarray(vggmod.trunk_apply(params, x, dtype=jnp.bfloat16),
                     np.float32)
    orig = sp.vgg_stem_pallas
    try:
        # force interpret mode on the fake-CPU test platform
        sp.vgg_stem_pallas = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        out = np.asarray(
            vggmod.trunk_apply(params, x, dtype=jnp.bfloat16,
                               fused_stem=True), np.float32)
    finally:
        sp.vgg_stem_pallas = orig
    assert out.shape == ref.shape
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - out).max() / denom < 0.05  # bf16 drift through trunk
