"""Trunk/head shape tests, TF-conv-parity checks, and importer semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu.models import mv3d, vgg
from mv3d_tf_tpu.utils import weights as W


@pytest.fixture(scope="module")
def params():
    return mv3d.init_params(jax.random.PRNGKey(0))


def test_trunk_shapes(params):
    # eval_shape: full-size shape math without running 601^2 convs on CPU
    bev = jax.ShapeDtypeStruct((1, 601, 601, 9), jnp.float32)
    img = jax.ShapeDtypeStruct((1, 384, 1248, 3), jnp.float32)
    c5, c5_2 = jax.eval_shape(
        lambda b, i: mv3d.extract_features(params, b, i), bev, img)
    # 601 -> 300 -> 150 -> 75 under VALID 2x2/2 pools (stride 8)
    assert c5.shape == (1, 75, 75, 512)
    assert c5_2.shape == (1, 48, 156, 512)


def test_rpn_head_shapes(params):
    c5 = jnp.zeros((1, 75, 75, 512))
    cls, bbox = mv3d.rpn_head(params, c5)
    assert cls.shape == (1, 75, 75, 8)     # 4 anchors x 2 classes
    assert bbox.shape == (1, 75, 75, 24)   # 4 anchors x 6 dof


def test_rpn_probs_pairwise():
    score = jnp.asarray(np.random.RandomState(0).randn(1, 3, 3, 8),
                        jnp.float32)
    prob = mv3d.rpn_probs(score)
    # each (bg, fg) pair sums to 1
    pairs = np.asarray(prob).reshape(1, 3, 3, 4, 2)
    np.testing.assert_allclose(pairs.sum(-1), 1.0, rtol=1e-5)
    fg = np.asarray(mv3d.rpn_fg_scores(prob))
    # fg scores laid out location-major, anchor-minor (h, w, a)
    np.testing.assert_allclose(fg.reshape(3, 3, 4), pairs[0, ..., 1],
                               rtol=1e-6)


def test_conv_matches_manual():
    # SAME conv + bias against an explicit dot product at one pixel
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    y = np.asarray(vgg.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              relu=False))
    exp = (x[0, 1:4, 1:4, :, None] * w).sum((0, 1, 2)) + b
    np.testing.assert_allclose(y[0, 2, 2], exp, rtol=1e-4)
    # ReLU clamps
    y2 = np.asarray(vgg.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    assert (y2 >= 0).all()


def test_fc_nhwc_flatten_with_import_perm(params):
    # fc_apply flattens NHWC; imported reference (channel-major) fc6
    # weights are row-permuted at load so the end result matches the
    # reference's transpose+matmul exactly
    rng = np.random.RandomState(2)
    x = rng.randn(3, 7, 7, 512).astype(np.float32)
    ref_w = rng.randn(25088, 2048).astype(np.float32) * 0.01
    ref_b = np.zeros(2048, np.float32)
    new = W.load_npy_weights(params, {"fc6_1": {"weights": ref_w,
                                                "biases": ref_b}}, log=None)
    y = np.asarray(mv3d.fc_apply(new["fc6_1"], jnp.asarray(x)))
    # reference semantics: NCHW flatten @ original weights
    flat = np.transpose(x, (0, 3, 1, 2)).reshape(3, -1)
    exp = np.maximum(flat @ ref_w + ref_b, 0)
    np.testing.assert_allclose(y, exp, rtol=2e-2, atol=2e-2)


def test_fusion_head_shapes(params):
    pooled = jnp.zeros((16, 7, 7, 512))
    cls_score, cls_prob, bbox_pred = mv3d.fusion_head(params, pooled, pooled)
    assert cls_score.shape == (16, 2)
    assert bbox_pred.shape == (16, 48)
    np.testing.assert_allclose(np.asarray(cls_prob).sum(1), 1.0, rtol=1e-5)


def test_dropout_train_vs_eval(params):
    pooled = jnp.ones((4, 7, 7, 512))
    a = mv3d.fusion_head(params, pooled, pooled)
    b = mv3d.fusion_head(params, pooled, pooled, keep_prob=0.5,
                         rng=jax.random.PRNGKey(1), train=True)
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))
    # eval is deterministic
    c = mv3d.fusion_head(params, pooled, pooled)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_weight_importer_skips_mismatch(params):
    logs = []
    pretrain = {
        "conv1_1": {"weights": np.ones((3, 3, 3, 64), np.float32),  # 3ch: skip
                    "biases": np.zeros((64,), np.float32)},
        "conv1_2": {"weights": np.full((3, 3, 64, 64), 0.5, np.float32),
                    "biases": np.ones((64,), np.float32)},
        "unknown_layer": {"weights": np.zeros((1, 1))},
    }
    new = W.load_npy_weights(params, pretrain, log=logs.append)
    # 9-channel BEV conv1_1 must stay at random init (shape mismatch skip)
    np.testing.assert_array_equal(np.asarray(new["conv1_1"]["weights"]),
                                  np.asarray(params["conv1_1"]["weights"]))
    # conv1_2 loads
    assert (np.asarray(new["conv1_2"]["weights"]) == 0.5).all()
    assert any("ignore conv1_1" in l for l in logs)
    assert any("ignore unknown_layer" in l for l in logs)
    # strict mode raises
    with pytest.raises(ValueError):
        W.load_npy_weights(params, {"conv1_1": pretrain["conv1_1"]},
                           ignore_missing=False, log=None)


def test_make_pretrain_dict():
    rng = np.random.RandomState(0)
    vgg_dict = {"conv1_1": {"weights": rng.randn(3, 3, 3, 64).astype(np.float32),
                            "biases": np.zeros(64, np.float32)},
                "fc6": {"weights": rng.randn(100, 40).astype(np.float32),
                        "biases": rng.randn(40).astype(np.float32)},
                "fc7": {"weights": rng.randn(40, 40).astype(np.float32),
                        "biases": rng.randn(40).astype(np.float32)}}
    out = W.make_mv3d_pretrain_dict(vgg_dict, fc_dim=8, seed=0)
    assert set(out) == {"conv1_1", "conv1_1_2", "fc6_1", "fc6_2",
                        "fc7_1", "fc7_2"}
    np.testing.assert_array_equal(out["conv1_1"]["weights"],
                                  out["conv1_1_2"]["weights"])
    assert out["fc6_1"]["weights"].shape == (100, 8)
    assert out["fc7_1"]["weights"].shape == (8, 8)
    np.testing.assert_array_equal(out["fc6_1"]["weights"],
                                  out["fc6_2"]["weights"])
