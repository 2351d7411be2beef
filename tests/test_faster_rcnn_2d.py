"""Legacy 2D Faster R-CNN path: shapes + canonical-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tf_tpu import faster_rcnn_2d as F2
from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.models import vggnet

H = W = 6           # tiny feature grid (96x96 input at stride 16)


@pytest.fixture(scope="module")
def params():
    return vggnet.init_params_2d(jax.random.PRNGKey(0))


def test_anchor_grid_2d():
    g = F2.get_anchor_grid_2d(H, W)
    assert g.shape == (H * W * 9, 4)
    # first 9 rows are the canonical base anchors at (0,0)
    from mv3d_tf_tpu.anchors import generate_anchors
    np.testing.assert_allclose(g[:9], generate_anchors())


def test_trunk_2d_stride16(params):
    out = jax.eval_shape(lambda x: vggnet.trunk_apply_2d(params, x),
                         jax.ShapeDtypeStruct((1, 96, 96, 3), jnp.float32))
    assert out.shape == (1, 6, 6, 512)


def test_proposal_layer_2d_decodes_classic(rng):
    # zero deltas -> proposals == clipped anchors (classic 2D decode; the
    # reference's own 2D layer is broken — see faster_rcnn_2d docstring)
    n = H * W * 9
    prob = np.zeros((1, H, W, 18), np.float32)
    fg = rng.rand(H, W, 9).astype(np.float32)
    prob.reshape(1, H, W, 9, 2)[..., 1] = fg
    deltas = np.zeros((1, H, W, 36), np.float32)
    im_info = np.array([96.0, 96.0, 1.0], np.float32)
    rois, scores, valid = F2.proposal_layer_2d(prob, deltas, im_info, H, W,
                                               pre_nms_top_n=100,
                                               post_nms_top_n=20)
    rois, valid = np.asarray(rois), np.asarray(valid)
    anchors = F2.get_anchor_grid_2d(H, W)
    # zero-delta decode shifts x2/y2 by +1 (the +1 width convention),
    # then clips — compare against that exact expectation
    dec = np.asarray(G.bbox_transform_inv(anchors,
                                          np.zeros((len(anchors), 4),
                                                   np.float32)))
    clipped = np.asarray(G.clip_boxes(dec, (96, 96)))
    for r in rois[valid]:
        assert (np.abs(clipped - r[1:]).max(1) < 1e-4).any()


def test_anchor_target_2d(rng):
    # 16x16 grid = 256x256 image: big enough to contain the smallest
    # (184x96) classic anchor
    hh = ww = 16
    anchors = F2.get_anchor_grid_2d(hh, ww)
    inside = np.where((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
                      & (anchors[:, 2] < 256) & (anchors[:, 3] < 256))[0]
    gt = np.zeros((4, 5), np.float32)
    gt[0, :4] = anchors[inside[3]]
    gt[0, 4] = 7          # some VOC class
    gt_valid = np.array([True, False, False, False])
    labels, targets = F2.anchor_target_layer_2d(
        jax.random.PRNGKey(0), gt, gt_valid,
        np.array([256.0, 256.0, 1.0], np.float32), hh, ww)
    labels = np.asarray(labels)
    assert labels[inside[3]] == 1
    # the 256-anchor batch fills as far as the (few) inside anchors allow;
    # anchors in the ignore band (0.3 <= IoU < 0.7, non-gt-best) stay -1
    from mv3d_tf_tpu.ops.iou import bbox_overlaps
    ovr = np.array(bbox_overlaps(anchors, gt[:1, :4]))[:, 0]
    n_sampled = (labels != -1).sum()
    assert 0 < n_sampled <= 256
    assert (ovr[labels == 0] < 0.3).all()
    # positive target vs itself is zero delta
    np.testing.assert_allclose(np.asarray(targets)[inside[3]], 0, atol=1e-5)


def test_proposal_target_2d_weights(rng):
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [10, 10, 60, 60, 5]
    gt[1] = [100, 100, 150, 150, 12]
    gt_valid = np.array([True, True, False, False])
    rois = np.zeros((30, 5), np.float32)
    rois[:, 1:] = np.array([8, 8, 58, 58]) + rng.uniform(-2, 2, (30, 4))
    out = F2.proposal_target_layer_2d(
        jax.random.PRNGKey(0), rois, np.ones(30, bool), gt, gt_valid,
        rois_per_image=16)
    labels = np.asarray(out["labels"])
    n_fg = int(np.asarray(out["num_fg"]))
    assert n_fg >= 1
    assert (labels[:n_fg] == 5).all()            # assigned gt class
    biw = np.asarray(out["bbox_inside_weights"])
    # weights set exactly in the class-5 block of fg rows
    assert (biw[:n_fg, 5 * 4:6 * 4] == 1).all()
    assert biw.sum() == n_fg * 4
    np.testing.assert_array_equal(
        biw, np.asarray(out["bbox_outside_weights"]))


@pytest.mark.slow
def test_im_detect_2d_end_to_end(params, rng):
    detect = F2.build_im_detect_2d(H, W, pre_nms_top_n=60, post_nms_top_n=10)
    img = (rng.rand(96, 96, 3) * 255).astype(np.float32)
    out = detect(params, img, np.array([96.0, 96.0, 1.0], np.float32))
    assert out["scores"].shape == (10, 21)
    assert out["boxes"].shape == (10, 84)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_snapshot_unnormalize_2d(params):
    from mv3d_tf_tpu.faster_rcnn_2d import snapshot_unnormalize_2d
    out = snapshot_unnormalize_2d(params)
    w0 = np.asarray(params["bbox_pred"]["weights"])
    w1 = np.asarray(out["bbox_pred"]["weights"])
    # dx columns scaled by 0.1, dw columns by 0.2
    np.testing.assert_allclose(w1[:, 4], w0[:, 4] * 0.1, rtol=1e-6)
    np.testing.assert_allclose(w1[:, 6], w0[:, 6] * 0.2, rtol=1e-6)
    # other layers untouched
    assert out["fc6"] is params["fc6"]


@pytest.mark.slow
def test_train_step_2d(params, rng):
    from mv3d_tf_tpu.faster_rcnn_2d import build_train_step_2d
    step, tx = build_train_step_2d(H, W, pre_nms_top_n=60, post_nms_top_n=10,
                                   rois_per_image=8)
    opt_state = tx.init(params)
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [10, 10, 60, 60, 7]
    batch = {"image": (rng.rand(96, 96, 3) * 255).astype(np.float32),
             "im_info": np.array([96.0, 96.0, 1.0], np.float32),
             "gt_boxes": gt,
             "gt_valid": np.array([True, False, False, False])}
    p1, o1, m = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # frozen conv1_1 must NOT move; trainable conv3_1 must move
    assert (np.asarray(p1["conv1_1"]["weights"])
            == np.asarray(params["conv1_1"]["weights"])).all()
    assert not (np.asarray(p1["conv3_1"]["weights"])
                == np.asarray(params["conv3_1"]["weights"])).all()
