"""Golden tests for geometry.py against independently-derived numpy oracles.

Each oracle below is written loop-first, straight from the formulas the
reference implements (cited per test), so a vectorization bug in the jnp
library cannot hide.
"""

import numpy as np
import pytest

from mv3d_tf_tpu import geometry as G

F = np.float64


# ---------------------------------------------------------------- oracles ---

def _lidar_to_bv_coord_np(x, y):
    # transform.py:13-20 (Xn=Yn=600 — the floor-division quirk)
    xx = 600 - np.floor((y - (-30.0)) / 0.1)
    yy = 600 - np.floor((x - 0.0) / 0.1)
    return xx, yy


def _bv_to_lidar_np(xx, yy):
    # transform.py:81-87
    y = 600 * 0.1 - (xx + 0.5) * 0.1 + (-30.0)
    x = 600 * 0.1 - (yy + 0.5) * 0.1 + 0.0
    return x, y


def _corners_oracle(box):
    # transform.py:290-315: one box (x,y,z,l,w,h) -> 24 values
    x, y, z, l, w, h = box
    xs = [x + l / 2, x + l / 2, x - l / 2, x - l / 2,
          x + l / 2, x + l / 2, x - l / 2, x - l / 2]
    ys = [y + w / 2, y - w / 2, y - w / 2, y + w / 2,
          y + w / 2, y - w / 2, y - w / 2, y + w / 2]
    zs = [z - h / 2] * 4 + [z + h / 2] * 4
    return np.array(xs + ys + zs)


# ------------------------------------------------------------------ tests ---

def test_grid_constants():
    # the reference's floor-division quirk: coordinate maps use 600,
    # the BEV raster is 601x601 (see geometry.py header note)
    assert G.Xn == 600 and G.Yn == 600
    assert G.BEV_H == 601 and G.BEV_W == 601
    assert G.N_SLICES == 8 and G.BEV_C == 9


def test_bv_coord_roundtrip(rng):
    x = rng.uniform(0, 60, 100)
    y = rng.uniform(-30, 30, 100)
    xx, yy = G.lidar_to_bv_coord(x, y)
    xx_np, yy_np = _lidar_to_bv_coord_np(x, y)
    np.testing.assert_allclose(np.asarray(xx), xx_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yy), yy_np, rtol=1e-6)
    # the reference's inverse is offset half a cell from the forward map
    # (Xn=600 quirk + the +0.5 cell-center): roundtrip error is in
    # [0.05, 0.15) meters, i.e. x' = floor(x*10)/10 - 0.05
    xi, yi = G.bv_to_lidar_coords(xx_np, yy_np)
    np.testing.assert_allclose(np.asarray(xi), np.floor(x * 10) / 10 - 0.05,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), np.floor(y * 10) / 10 - 0.05,
                               atol=1e-5)


def test_bv_anchor_to_lidar_fixed_z():
    anchors = np.array([[281.0, 281.0, 320.0, 320.0],
                        [0.0, 0.0, 38.0, 15.0]], np.float32)
    out = np.asarray(G.bv_anchor_to_lidar(anchors))
    # z center and height are constants (transform.py:106-107)
    np.testing.assert_allclose(out[:, 2], -(1.73 - 1.56 / 2), rtol=1e-6)
    np.testing.assert_allclose(out[:, 5], 1.56, rtol=1e-6)
    # lengths from y-extent, widths from x-extent, in meters
    np.testing.assert_allclose(out[0, 3], 39 * 0.1, rtol=1e-5)
    np.testing.assert_allclose(out[0, 4], 39 * 0.1, rtol=1e-5)
    np.testing.assert_allclose(out[1, 3], 15 * 0.1, rtol=1e-5)
    np.testing.assert_allclose(out[1, 4], 38 * 0.1, rtol=1e-5)


def test_lidar_3d_to_bv_oracle(rng):
    rois = rng.uniform(1, 50, (20, 6)).astype(np.float32)
    out = np.asarray(G.lidar_3d_to_bv(rois))
    for i, r in enumerate(rois):
        x1, y1 = _lidar_to_bv_coord_np(r[0] + r[3] * .5, r[1] + r[4] * .5)
        x2, y2 = _lidar_to_bv_coord_np(r[0] - r[3] * .5, r[1] - r[4] * .5)
        np.testing.assert_allclose(out[i], [x1, y1, x2, y2], rtol=1e-4)


def test_lidar_3d_to_corners_oracle(rng):
    boxes = rng.uniform(1, 30, (10, 6))
    out = np.asarray(G.lidar_3d_to_corners(boxes))
    for i, b in enumerate(boxes):
        np.testing.assert_allclose(out[i], _corners_oracle(b), rtol=1e-5)


def test_corners_roundtrip_3d(rng):
    boxes = rng.uniform(1, 30, (10, 6)).astype(np.float32)
    cnr = G.lidar_3d_to_corners(boxes)
    back = np.asarray(G.lidar_cnr_to_3d(cnr, boxes[:, 3:6]))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-4)


def test_corners_to_bv_matches_box_footprint(rng):
    boxes = rng.uniform(5, 25, (10, 6)).astype(np.float32)
    cnr = G.lidar_3d_to_corners(boxes)
    bv_from_cnr = np.asarray(G.corners_to_bv(cnr))
    bv_direct = np.asarray(G.lidar_3d_to_bv(boxes))
    # axis-aligned corners: footprint == box extent (transform.py:342-366)
    np.testing.assert_allclose(bv_from_cnr, bv_direct, atol=1e-3)


def test_compute_corners_3d_zero_yaw():
    box = np.array([1.0, 2.0, 3.0, 4.0, 2.0, 1.5], np.float32)
    c = np.asarray(G.compute_corners_3d(box, 0.0))
    # transform.py:441-465: y corners at y and y-h; x +-l/2; z +-w/2
    np.testing.assert_allclose(sorted(set(np.round(c[0], 4))), [-1.0, 3.0])
    np.testing.assert_allclose(sorted(set(np.round(c[1], 4))), [0.5, 2.0])
    np.testing.assert_allclose(sorted(set(np.round(c[2], 4))), [2.0, 4.0])


def test_compute_corners_3d_yaw_rotation():
    box = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.5], np.float32)
    c0 = np.asarray(G.compute_corners_3d(box, 0.0))
    c90 = np.asarray(G.compute_corners_3d(box, np.pi / 2))
    # ry=pi/2 about y axis: x' = z, z' = -x
    np.testing.assert_allclose(c90[0], c0[2], atol=1e-5)
    np.testing.assert_allclose(c90[2], -c0[0], atol=1e-5)


def test_camera_to_lidar_cnr_legacy_translation():
    # Tr = identity rotation + translation t: reference uses homog 0 and a
    # permuted T, so pure-rotation identity must pass points through
    # untouched and IGNORE the true translation (transform.py:502-524).
    Tr = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])]).astype(np.float32)
    pts = np.arange(24, dtype=np.float32).reshape(3, 8)
    out = np.asarray(G.camera_to_lidar_cnr(pts, Tr)).reshape(3, 8)
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_lidar_cnr_to_img_oracle(rng):
    # realistic KITTI-style calib (well-conditioned depths; random matrices
    # can put the plane-at-infinity through the boxes and blow up f32)
    P2 = np.array([[707.0, 0.0, 601.8, 45.7],
                   [0.0, 707.0, 183.1, -0.34],
                   [0.0, 0.0, 1.0, 0.005]])
    R0 = np.vstack([np.array([[0.9999, 0.0098, -0.0074],
                              [-0.0099, 0.9999, -0.0043],
                              [0.0074, 0.0044, 0.9999]]), np.zeros((1, 3))])
    Tr = np.array([[0.0002, -0.9999, -0.0106, -0.002],
                   [0.0104, 0.0106, -0.9999, -0.075],
                   [0.9999, 0.0002, 0.0105, -0.272]])
    xs = rng.uniform(5, 40, (6, 8))
    ys = rng.uniform(-15, 15, (6, 8))
    zs = rng.uniform(-2, 1, (6, 8))
    corners = np.concatenate([xs, ys, zs], axis=1)
    out = np.asarray(G.lidar_cnr_to_img(corners, Tr.reshape(-1),
                                        R0.reshape(-1), P2.reshape(-1),
                                        legacy_int=False))
    # compare pre-trunc against a float64 oracle (trunc is checked separately
    # below — at f32 rounding boundaries trunc flips by a whole pixel)
    mat = P2 @ R0 @ Tr
    for i in range(6):
        c = np.vstack([corners[i].reshape(3, 8), np.zeros(8)])
        img = mat @ c
        img = img / img[2]          # NO abs — parity with transform.py:491
        exp = np.array([img[0].min(), img[1].min(), img[0].max(), img[1].max()])
        np.testing.assert_allclose(out[i], exp, rtol=1e-3, atol=1e-2)


def test_lidar_cnr_to_img_full_vs_legacy(rng):
    """Quality-mode projection (translations kept) vs the legacy
    0-homogeneous one: the legacy box is offset by
    ~(P2[:,:3]@R0@t_Tr + P2[:,3]) / depth px — the documented cause of
    depressed official 2D AP in parity mode (VERDICT r1 weak #3)."""
    P2 = np.array([[707.0, 0.0, 601.8, 45.7],
                   [0.0, 707.0, 183.1, -0.34],
                   [0.0, 0.0, 1.0, 0.005]])
    R0 = np.array([[0.9999, 0.0098, -0.0074],
                   [-0.0099, 0.9999, -0.0043],
                   [0.0074, 0.0044, 0.9999]])
    Tr = np.array([[0.0002, -0.9999, -0.0106, -0.002],
                   [0.0104, 0.0106, -0.9999, -0.075],
                   [0.9999, 0.0002, 0.0105, -0.272]])
    # one axis-aligned car-sized box 20 m ahead
    box = np.array([[20.0, 2.0, -0.8, 3.9, 1.6, 1.56]], np.float32)
    corners = np.asarray(G.lidar_3d_to_corners(box))
    full = np.asarray(G.lidar_cnr_to_img_full(
        corners, Tr.reshape(-1),
        np.vstack([R0, np.zeros((1, 3))]).reshape(-1), P2.reshape(-1)))
    # float64 oracle of the standard KITTI chain
    c = corners.reshape(3, 8)
    cam = Tr @ np.vstack([c, np.ones(8)])
    rect = R0 @ cam
    img = P2 @ np.vstack([rect, np.ones(8)])
    img = img / img[2]
    exp = np.array([img[0].min(), img[1].min(), img[0].max(), img[1].max()])
    np.testing.assert_allclose(full[0], exp, rtol=1e-4, atol=5e-2)

    legacy = np.asarray(G.lidar_cnr_to_img(
        corners, Tr.reshape(-1),
        np.vstack([R0, np.zeros((1, 3))]).reshape(-1), P2.reshape(-1),
        legacy_int=False))
    # float64 oracle of the legacy (0-homogeneous) chain — legacy must
    # track the reference formula, not the proper one
    matl = P2 @ np.vstack([R0, np.zeros((1, 3))]) @ Tr
    imgl = matl @ np.vstack([c, np.zeros(8)])
    imgl = imgl / imgl[2]
    expl = np.array([imgl[0].min(), imgl[1].min(),
                     imgl[0].max(), imgl[1].max()])
    np.testing.assert_allclose(legacy[0], expl, rtol=1e-4, atol=5e-2)
    # the two projections disagree by real pixels (translation + depth
    # shift): this is the documented parity-mode 2D AP depressant
    off = np.abs(legacy[0] - full[0])
    assert off.max() > 0.5
    assert off.max() < 30.0


def test_lidar_cnr_to_img_trunc():
    # legacy int32 truncation (toward zero) of the output box
    # (transform.py:500: .astype(np.int32))
    Tr = np.hstack([np.eye(3), np.zeros((3, 1))])
    R0 = np.vstack([np.eye(3), np.zeros((1, 3))])
    # P2 maps (x,y,z) -> (x, y, z): picture plane at z=1
    P2 = np.hstack([np.eye(3), np.zeros((3, 1))])
    corners = np.concatenate([
        np.full(8, -7.75), np.full(8, 6.25), np.full(8, 2.5)]).reshape(1, 24)
    out = np.asarray(G.lidar_cnr_to_img(corners, Tr.reshape(-1),
                                        R0.reshape(-1), P2.reshape(-1)))
    # x/z = -3.1 -> trunc -3 (toward zero); y/z = 2.5 -> 2
    np.testing.assert_allclose(out[0], [-3.0, 2.0, -3.0, 2.0])


def test_bbox_transform_roundtrip_2d(rng):
    ex = np.sort(rng.uniform(0, 100, (30, 4)), axis=0).astype(np.float32)
    ex = np.hstack([ex[:, :2], ex[:, :2] + rng.uniform(5, 40, (30, 2))])
    gt = np.hstack([ex[:, :2] + rng.uniform(-3, 3, (30, 2)),
                    ex[:, 2:] + rng.uniform(-3, 3, (30, 2))]).astype(np.float32)
    deltas = G.bbox_transform(ex, gt)
    back = np.asarray(G.bbox_transform_inv(ex, np.asarray(deltas)))
    # classic Girshick decode is NOT an exact inverse: the +1 width
    # convention makes x2/y2 come back as gt+1 (bbox_transform.py:98-104)
    np.testing.assert_allclose(back[:, :2], gt[:, :2], atol=1e-2)
    np.testing.assert_allclose(back[:, 2:], gt[:, 2:] + 1.0, atol=1e-2)


def test_bbox_transform_3d_quirk(rng):
    # encode divides dx by WIDTH and dy by LENGTH (bbox_transform.py:49-50)
    ex = rng.uniform(2, 10, (5, 6))
    gt = rng.uniform(2, 10, (5, 6))
    d = np.asarray(G.bbox_transform_3d(ex, gt))
    np.testing.assert_allclose(d[:, 0], (gt[:, 0] - ex[:, 0]) / ex[:, 4], rtol=1e-5)
    np.testing.assert_allclose(d[:, 1], (gt[:, 1] - ex[:, 1]) / ex[:, 3], rtol=1e-5)
    # decode multiplies dx by LENGTH (bbox_transform.py:134) — NOT the inverse
    inv = np.asarray(G.bbox_transform_inv_3d(ex, d))
    np.testing.assert_allclose(inv[:, 0], d[:, 0] * ex[:, 3] + ex[:, 0], rtol=1e-5)
    # sizes DO roundtrip
    np.testing.assert_allclose(inv[:, 3:], gt[:, 3:], rtol=1e-4)


def test_bbox_transform_cnr_roundtrip(rng):
    boxes = rng.uniform(3, 30, (8, 6)).astype(np.float32)
    ex_cnr = np.asarray(G.lidar_3d_to_corners(boxes))
    gt_cnr = ex_cnr + rng.uniform(-1, 1, ex_cnr.shape).astype(np.float32)
    t = np.asarray(G.bbox_transform_cnr(ex_cnr, gt_cnr))
    # diag normalization: diag from GT corners 0 and 6 (bbox_transform.py:63-68)
    diag = np.linalg.norm(gt_cnr[:, 0::8] - gt_cnr[:, 6::8], axis=1)
    np.testing.assert_allclose(t * diag[:, None], gt_cnr - ex_cnr, rtol=1e-4)
    # inverse uses the EX boxes' diag (test path: boxes_cnr are proposals)
    back = np.asarray(G.bbox_transform_inv_cnr(ex_cnr, t))
    diag_ex = np.linalg.norm(ex_cnr[:, 0::8] - ex_cnr[:, 6::8], axis=1)
    exp = t * diag_ex[:, None] + ex_cnr
    np.testing.assert_allclose(back, exp, rtol=1e-4)


def test_clip_boxes():
    boxes = np.array([[-5.0, -5.0, 700.0, 700.0],
                      [10.0, 20.0, 30.0, 40.0]], np.float32)
    out = np.asarray(G.clip_boxes(boxes, (601, 601)))
    np.testing.assert_allclose(out[0], [0, 0, 600, 600])
    np.testing.assert_allclose(out[1], [10, 20, 30, 40])


def test_lidar_to_bv_batch_column(rng):
    rois = rng.uniform(1, 50, (7, 7)).astype(np.float32)
    out = np.asarray(G.lidar_to_bv(rois))
    np.testing.assert_allclose(out[:, 0], rois[:, 0], rtol=1e-6)
    inner = np.asarray(G.lidar_3d_to_bv(rois[:, 1:7]))
    np.testing.assert_allclose(out[:, 1:], inner, rtol=1e-6)
