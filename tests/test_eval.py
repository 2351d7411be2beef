"""Full detection forward path: shapes, masking, and post-processing."""

import jax
import numpy as np
import pytest

from mv3d_tf_tpu.eval import build_detect_fn, frame_detections
from mv3d_tf_tpu.models import mv3d


def _calib():
    calib = np.zeros((4, 12), np.float32)
    calib[0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34, 0, 0, 1.0, 0.005]
    calib[1] = calib[0]
    calib[2, :9] = np.eye(3).reshape(-1)
    calib[3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106, -0.9999,
                -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    return calib


@pytest.fixture(scope="module")
def small_detect():
    # tiny spatial config to keep CPU runtime sane: BEV 81x81 -> 10x10 feat
    return build_detect_fn(feat_h=10, feat_w=10, pre_nms_top_n=100,
                           post_nms_top_n=30)


@pytest.fixture(scope="module")
def small_inputs(small_detect):
    rng = np.random.RandomState(0)
    params = mv3d.init_params(jax.random.PRNGKey(0))
    bev = rng.rand(81, 81, 9).astype(np.float32)
    img = (rng.rand(88, 120, 3) * 255).astype(np.float32)
    det = small_detect(params, bev, img, _calib())
    return det


def test_detect_shapes(small_inputs):
    det = small_inputs
    assert det["scores"].shape == (30, 2)
    assert det["boxes_bv"].shape == (30, 8)
    assert det["boxes_cnr"].shape == (30, 48)
    assert det["boxes_cnr_r"].shape == (30, 48)
    assert det["valid"].shape == (30,)
    assert np.isfinite(np.asarray(det["scores"])).all()


def test_detect_scores_softmax(small_inputs):
    det = small_inputs
    val = np.asarray(det["valid"])
    s = np.asarray(det["scores"])[val]
    np.testing.assert_allclose(s.sum(1), 1.0, rtol=1e-4)


def test_unregressed_corner_duplication(small_inputs):
    det = small_inputs
    cnr = np.asarray(det["boxes_cnr"])
    # the two class blocks are identical copies (test_mv.py:255)
    np.testing.assert_array_equal(cnr[:, :24], cnr[:, 24:])


def test_invalid_rows_zeroed(small_inputs):
    det = small_inputs
    val = np.asarray(det["valid"])
    if (~val).any():
        assert (np.asarray(det["scores"])[~val] == 0).all()
        assert (np.asarray(det["boxes_bv"])[~val] == 0).all()


def test_frame_detections_postprocessing(small_inputs):
    out = frame_detections(small_inputs, score_thresh=0.0, nms_thresh=0.99,
                           max_per_image=5)
    dets_bv, dets_cnr, dets_cnr_r = out[1]
    assert dets_bv.shape[1] == 5
    assert dets_cnr.shape[1] == 25
    # max_per_image cap keeps scores >= the 5th-highest (ties survive,
    # test_mv.py:496-501 semantics)
    pre = frame_detections(small_inputs, score_thresh=0.0, nms_thresh=0.99,
                           max_per_image=0)
    all_scores = pre[1][0][:, -1]
    if len(all_scores) > 5:
        fifth = np.sort(all_scores)[-5]
        assert (dets_bv[:, -1] >= fifth).all()
    # scores sorted as NMS keeps them (descending)
    assert (np.diff(dets_bv[:, -1]) <= 1e-6).all()


def test_show_pointcloud_3d(rng):
    """Headless 3D render: points + wireframes land inside the canvas."""
    import numpy as np
    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.utils.draw import show_pointcloud_3d

    scan = np.hstack([
        rng.uniform([0, -30, -2], [60, 30, 1], (5000, 3)),
        rng.rand(5000, 1)]).astype(np.float32)
    cnr = np.asarray(G.lidar_3d_to_corners(np.array(
        [[15, 0, -1, 3.9, 1.6, 1.56]], np.float32)))
    img = show_pointcloud_3d(scan, [cnr], colors=[(64, 255, 64)])
    assert img.shape == (500, 1000, 3) and img.dtype == np.uint8
    assert int((img > 0).sum()) > 1000          # points rendered
    assert int((img[..., 1] == 255).sum()) > 50  # wireframe drawn
