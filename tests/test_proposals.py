"""Proposal layer vs a numpy oracle that follows the reference flow
(proposal_layer_tf.py) step by step."""

import numpy as np

from mv3d_tf_tpu.anchors import get_anchor_grid
from mv3d_tf_tpu.ops.nms import nms_np
from mv3d_tf_tpu.proposals import proposal_layer_3d

H = W = 10
A = 4


def _calib():
    P2 = np.array([[707.0, 0.0, 601.8, 45.7],
                   [0.0, 707.0, 183.1, -0.34],
                   [0.0, 0.0, 1.0, 0.005]])
    R0 = np.array([[0.9999, 0.0098, -0.0074],
                   [-0.0099, 0.9999, -0.0043],
                   [0.0074, 0.0044, 0.9999]])
    Tr = np.array([[0.0002, -0.9999, -0.0106, -0.002],
                   [0.0104, 0.0106, -0.9999, -0.075],
                   [0.9999, 0.0002, 0.0105, -0.272]])
    calib = np.zeros((4, 12), np.float32)
    calib[0] = P2.reshape(-1)
    calib[1] = P2.reshape(-1)
    calib[2, :9] = R0.reshape(-1)
    calib[3] = Tr.reshape(-1)
    return calib


def _oracle(scores, deltas, calib, pre, post, thresh, min_size=5):
    """Reference flow in plain numpy (float32 to match the jax path)."""
    grid = get_anchor_grid(H, W)
    a3 = grid.anchors_3d.astype(np.float32)
    d = deltas.astype(np.float32)
    # bbox_transform_inv_3d (dx*length, dy*width, dz*height)
    p3 = np.zeros_like(d)
    p3[:, 0] = d[:, 0] * a3[:, 3] + a3[:, 0]
    p3[:, 1] = d[:, 1] * a3[:, 4] + a3[:, 1]
    p3[:, 2] = d[:, 2] * a3[:, 5] + a3[:, 2]
    p3[:, 3] = np.exp(d[:, 3]) * a3[:, 3]
    p3[:, 4] = np.exp(d[:, 4]) * a3[:, 4]
    p3[:, 5] = np.exp(d[:, 5]) * a3[:, 5]
    # lidar_3d_to_bv
    bv = np.zeros((len(p3), 4), np.float32)
    bv[:, 0] = 600 - np.floor(((p3[:, 1] + p3[:, 4] * .5) + 30.0) / 0.1)
    bv[:, 1] = 600 - np.floor((p3[:, 0] + p3[:, 3] * .5) / 0.1)
    bv[:, 2] = 600 - np.floor(((p3[:, 1] - p3[:, 4] * .5) + 30.0) / 0.1)
    bv[:, 3] = 600 - np.floor((p3[:, 0] - p3[:, 3] * .5) / 0.1)
    # corners -> image box (second lidar_cnr_to_img definition)
    l, w, h = p3[:, 3:4], p3[:, 4:5], p3[:, 5:6]
    xs = p3[:, 0:1] + l * np.array([1, 1, -1, -1, 1, 1, -1, -1]) * .5
    ys = p3[:, 1:2] + w * np.array([1, -1, -1, 1, 1, -1, -1, 1]) * .5
    zs = p3[:, 2:3] + h * np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * .5
    cnr = np.stack([xs, ys, zs], 1).astype(np.float32)        # (N,3,8)
    P2 = calib[0].reshape(3, 4)
    R0m = calib[2].reshape(4, 3)
    Tr = calib[3].reshape(3, 4)
    mat = (P2 @ R0m @ Tr).astype(np.float32)
    c4 = np.concatenate([cnr, np.zeros((len(cnr), 1, 8), np.float32)], 1)
    img = np.einsum('ij,njk->nik', mat, c4)
    img = img / img[:, 2:3, :]
    pimg = np.trunc(np.stack([img[:, 0].min(1), img[:, 1].min(1),
                              img[:, 0].max(1), img[:, 1].max(1)], 1))
    # clip bv
    bv[:, 0::2] = np.clip(bv[:, 0::2], 0, 600)
    bv[:, 1::2] = np.clip(bv[:, 1::2], 0, 600)
    # filters
    ws = bv[:, 2] - bv[:, 0] + 1
    hs = bv[:, 3] - bv[:, 1] + 1
    keep = np.where((ws >= min_size) & (hs >= min_size))[0]
    bv, p3, pimg, sc = bv[keep], p3[keep], pimg[keep], scores[keep]
    keep = np.where((pimg[:, 0] >= -50) & (pimg[:, 2] <= 1292)
                    & (pimg[:, 1] >= -50) & (pimg[:, 3] <= 425))[0]
    bv, p3, pimg, sc = bv[keep], p3[keep], pimg[keep], sc[keep]
    order = sc.argsort()[::-1][:pre]
    bv, p3, pimg, sc = bv[order], p3[order], pimg[order], sc[order]
    keep = nms_np(np.hstack([bv, sc[:, None]]).astype(np.float32), thresh)
    keep = keep[:post]
    return bv[keep], pimg[keep], p3[keep], sc[keep]


def test_proposal_layer_matches_oracle(rng):
    calib = _calib()
    n = H * W * A
    scores_fg = (rng.permutation(n).astype(np.float32) + 1) / (n + 1)
    prob = np.zeros((1, H, W, 2 * A), np.float32)
    prob.reshape(1, H, W, A, 2)[..., 1] = scores_fg.reshape(H, W, A)
    prob.reshape(1, H, W, A, 2)[..., 0] = 1 - scores_fg.reshape(H, W, A)
    deltas = (rng.randn(1, H, W, 6 * A) * 0.05).astype(np.float32)

    out = proposal_layer_3d(prob, deltas, calib, H, W,
                            pre_nms_top_n=200, post_nms_top_n=50,
                            nms_thresh=0.7)
    val = np.asarray(out["valid"])
    got_bv = np.asarray(out["rois_bv"])[val][:, 1:]
    got_img = np.asarray(out["rois_img"])[val][:, 1:]
    got_3d = np.asarray(out["rois_3d"])[val][:, 1:]
    got_sc = np.asarray(out["scores"])[val]

    exp_bv, exp_img, exp_3d, exp_sc = _oracle(
        scores_fg, deltas.reshape(-1, 6), calib, 200, 50, 0.7)

    assert got_bv.shape == exp_bv.shape
    np.testing.assert_allclose(got_sc, exp_sc, rtol=1e-5)
    np.testing.assert_allclose(got_bv, exp_bv, atol=1e-2)
    np.testing.assert_allclose(got_3d, exp_3d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_img, exp_img, atol=1.01)  # trunc boundary


def test_proposal_layer_fixed_output_shape(rng):
    calib = _calib()
    prob = np.full((1, H, W, 2 * A), 0.5, np.float32)
    deltas = np.zeros((1, H, W, 6 * A), np.float32)
    out = proposal_layer_3d(prob, deltas, calib, H, W,
                            pre_nms_top_n=100, post_nms_top_n=20,
                            nms_thresh=0.7)
    assert out["rois_bv"].shape == (20, 5)
    assert out["rois_img"].shape == (20, 5)
    assert out["rois_3d"].shape == (20, 7)
    # invalid slots are fully zeroed
    val = np.asarray(out["valid"])
    assert (np.asarray(out["rois_bv"])[~val] == 0).all()


def test_proposal_layer_batch_column_zero(rng):
    calib = _calib()
    n = H * W * A
    scores_fg = rng.rand(n).astype(np.float32)
    prob = np.zeros((1, H, W, 2 * A), np.float32)
    prob.reshape(1, H, W, A, 2)[..., 1] = scores_fg.reshape(H, W, A)
    deltas = (rng.randn(1, H, W, 6 * A) * 0.02).astype(np.float32)
    out = proposal_layer_3d(prob, deltas, calib, H, W,
                            pre_nms_top_n=100, post_nms_top_n=20,
                            nms_thresh=0.5)
    assert (np.asarray(out["rois_bv"])[:, 0] == 0).all()
    assert (np.asarray(out["rois_3d"])[:, 0] == 0).all()
