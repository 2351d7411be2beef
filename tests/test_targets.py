"""Anchor/proposal target layers: label semantics, sampling quotas,
target correctness."""

import jax
import numpy as np

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.anchors import get_anchor_grid
from mv3d_tf_tpu.ops.iou import bbox_overlaps
from mv3d_tf_tpu.targets import anchor_target_layer, proposal_target_layer_3d

MAX_GT = 8
H = W = 10


def _gt_from_anchor(grid, idx, jitter=0.0):
    """A gt box equal to anchor idx's BEV rect (IoU 1.0 with it)."""
    a = grid.anchors_bv[idx]
    return np.array([a[0] + jitter, a[1] + jitter, a[2] + jitter,
                     a[3] + jitter, 1.0], np.float32)


def _pad_gt(rows):
    bv = np.zeros((MAX_GT, 5), np.float32)
    valid = np.zeros(MAX_GT, bool)
    for i, r in enumerate(rows):
        bv[i] = r
        valid[i] = True
    return bv, valid


def _gt3d_for(bv, valid):
    g3 = np.zeros((MAX_GT, 7), np.float32)
    g3[:, 3:6] = 1.0                      # nonzero sizes to keep log() finite
    for i in range(MAX_GT):
        if valid[i]:
            a3 = np.asarray(G.bv_anchor_to_lidar(bv[i:i + 1, :4]))[0]
            g3[i, :6] = a3
            g3[i, 6] = 1.0
    return g3


def test_anchor_target_basic_labels(rng):
    grid = get_anchor_grid(H, W)
    # pick an inside anchor to act as gt
    inside_idx = np.where(grid.inside)[0]
    gt_bv, gt_valid = _pad_gt([_gt_from_anchor(grid, inside_idx[40])])
    gt_3d = _gt3d_for(gt_bv, gt_valid)

    labels, targets = anchor_target_layer(
        jax.random.PRNGKey(0), gt_bv, gt_valid, gt_3d, H, W)
    labels = np.asarray(labels)
    targets = np.asarray(targets)
    assert labels.shape == (grid.total,)
    # the exact-match anchor is positive
    assert labels[inside_idx[40]] == 1
    # quotas: <= 32 fg, exactly 128 non-ignored (plenty of bg available)
    assert (labels == 1).sum() <= 32
    assert (labels != -1).sum() == 128
    # outside anchors are all ignored
    assert (labels[~grid.inside] == -1).all()
    # bg labels have IoU < 0.5 with gt
    ovr = np.asarray(bbox_overlaps(grid.anchors_bv, gt_bv[:1, :4]))[:, 0]
    assert (ovr[labels == 0] < 0.5).all()
    # positive targets match bbox_transform_3d vs the gt
    pos = np.where(labels == 1)[0]
    exp = np.asarray(G.bbox_transform_3d(grid.anchors_3d[pos],
                                         np.tile(gt_3d[0, :6], (len(pos), 1))))
    np.testing.assert_allclose(targets[pos], exp, atol=1e-5)


def test_anchor_target_fg_subsample(rng):
    grid = get_anchor_grid(H, W)
    # many gts -> many positives -> fg capped at 32
    inside_idx = np.where(grid.inside)[0]
    gts = [_gt_from_anchor(grid, inside_idx[i * 37]) for i in range(MAX_GT)]
    gt_bv, gt_valid = _pad_gt(gts)
    gt_3d = _gt3d_for(gt_bv, gt_valid)
    labels, _ = anchor_target_layer(
        jax.random.PRNGKey(1), gt_bv, gt_valid, gt_3d, H, W)
    labels = np.asarray(labels)
    assert (labels == 1).sum() <= 32
    assert (labels == 0).sum() == 128 - (labels == 1).sum()


def test_anchor_target_deterministic_per_key():
    grid = get_anchor_grid(H, W)
    inside_idx = np.where(grid.inside)[0]
    gt_bv, gt_valid = _pad_gt([_gt_from_anchor(grid, inside_idx[10])])
    gt_3d = _gt3d_for(gt_bv, gt_valid)
    l1, _ = anchor_target_layer(jax.random.PRNGKey(7), gt_bv, gt_valid,
                                gt_3d, H, W)
    l2, _ = anchor_target_layer(jax.random.PRNGKey(7), gt_bv, gt_valid,
                                gt_3d, H, W)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    l3, _ = anchor_target_layer(jax.random.PRNGKey(8), gt_bv, gt_valid,
                                gt_3d, H, W)
    assert not np.array_equal(np.asarray(l1), np.asarray(l3))


def _proposal_inputs(rng, n_props=40):
    grid = get_anchor_grid(H, W)
    inside_idx = np.where(grid.inside)[0]
    gt_bv, gt_valid = _pad_gt([_gt_from_anchor(grid, inside_idx[40]),
                               _gt_from_anchor(grid, inside_idx[200])])
    gt_3d = _gt3d_for(gt_bv, gt_valid)
    gt_cnr = np.zeros((MAX_GT, 25), np.float32)
    gt_cnr[:, :24] = np.asarray(G.lidar_3d_to_corners(gt_3d[:, :6]))
    gt_cnr[:, 24] = gt_valid

    # proposals: jittered copies of the gts (fg) + far-away boxes (bg)
    props_bv = np.zeros((n_props, 5), np.float32)
    props_3d = np.zeros((n_props, 7), np.float32)
    valid = np.ones(n_props, bool)
    for i in range(n_props):
        src = gt_bv[i % 2, :4]
        if i < 10:
            props_bv[i, 1:5] = src + rng.uniform(-1, 1, 4)      # high IoU
        else:
            props_bv[i, 1:5] = src + 150 + rng.uniform(0, 60)   # ~0 IoU
        a3 = np.asarray(G.bv_anchor_to_lidar(props_bv[i:i + 1, 1:5]))[0]
        props_3d[i, 1:7] = a3
    calib = np.zeros((4, 12), np.float32)
    calib[0, :] = 1
    calib[2, :9] = np.eye(3).reshape(-1)
    calib[3] = [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]
    return props_bv, props_3d, valid, gt_bv, gt_valid, gt_3d, gt_cnr, calib


def test_proposal_target_layout(rng):
    (props_bv, props_3d, valid, gt_bv, gt_valid, gt_3d, gt_cnr,
     calib) = _proposal_inputs(rng)
    out = proposal_target_layer_3d(
        jax.random.PRNGKey(0), props_bv, props_3d, valid,
        gt_bv, gt_valid, gt_3d, gt_cnr, calib, rois_per_image=32)
    labels = np.asarray(out["labels"])
    vmask = np.asarray(out["valid"])
    n_fg = int(np.asarray(out["num_fg"]))
    # fg quota: 25% of 32 = 8; 10 jittered + 2 gt-as-roi candidates -> 8
    assert n_fg == 8
    # fg rows first, all labeled 1; then bg rows labeled 0
    assert (labels[:n_fg] == 1).all()
    assert (labels[n_fg:][vmask[n_fg:]] == 0).all()
    # bbox targets: nonzero only in fg rows, class-1 block (cols 24:48)
    t = np.asarray(out["bbox_targets"])
    assert t.shape == (32, 48)
    assert (t[:, :24] == 0).all()                      # bg class block empty
    assert (np.abs(t[:n_fg, 24:]).sum(1) > 0).any()
    assert (t[n_fg:] == 0).all()
    # rois_img has batch column 0
    assert (np.asarray(out["rois_img"])[:, 0] == 0).all()


def test_proposal_target_corner_targets_decode_back(rng):
    (props_bv, props_3d, valid, gt_bv, gt_valid, gt_3d, gt_cnr,
     calib) = _proposal_inputs(rng)
    out = proposal_target_layer_3d(
        jax.random.PRNGKey(0), props_bv, props_3d, valid,
        gt_bv, gt_valid, gt_3d, gt_cnr, calib, rois_per_image=32)
    n_fg = int(np.asarray(out["num_fg"]))
    rois3d = np.asarray(out["rois_3d"])[:n_fg, 1:7]
    t = np.asarray(out["bbox_targets"])[:n_fg, 24:48]
    # decode: roi corners + t * diag(gt) must equal the assigned gt corners
    roi_cnr = np.asarray(G.lidar_3d_to_corners(rois3d))
    rec = roi_cnr + t * np.asarray(
        G.corner_diag(roi_cnr + t * 1.0))[:, None] * 0  # placeholder
    # verify via target definition: t = (gt_cnr - roi_cnr)/diag(gt_cnr)
    # -> gt_cnr = roi_cnr + t*diag(gt_cnr); check consistency against both gts
    ok = np.zeros(n_fg, bool)
    for g in range(2):
        diag = np.linalg.norm(gt_cnr[g, 0::8][:3] * 0 +
                              (gt_cnr[g, [0, 8, 16]] - gt_cnr[g, [6, 14, 22]]))
        cand = roi_cnr + t * diag
        ok |= np.abs(cand - gt_cnr[g, :24]).max(1) < 1e-2
    assert ok.all()
