"""Multiscale (IS_MULTISCALE) data path vs reference semantics
(lib/roi_data_layer/minibatch2.py, roidb2.py)."""

import numpy as np
import pytest

from mv3d_tf_tpu.config import cfg
from mv3d_tf_tpu.data import multiscale as ms


@pytest.fixture
def roidb_2im(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(7)
    roidb = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 255, (60, 80, 3), np.uint8)).save(p)
        # 2 gt boxes + 6 proposal boxes around them
        gt = np.array([[10, 10, 30, 40], [40, 20, 70, 50]], np.float32)
        prop = np.vstack([
            gt + rng.randint(-2, 3, (2, 4)),
            gt + rng.randint(-12, -5, (2, 4)),
            np.array([[2, 2, 12, 12], [60, 2, 78, 18]], np.float32),
        ]).clip(0, 79)
        boxes = np.vstack([gt, prop]).astype(np.uint16)
        from mv3d_tf_tpu.ops.iou import bbox_overlaps
        ov = np.asarray(bbox_overlaps(boxes.astype(np.float32),
                                      gt.astype(np.float32)))
        gt_classes = np.zeros(len(boxes), np.int32)
        gt_classes[:2] = 1
        roidb.append({
            "image": str(p), "flipped": False, "boxes": boxes,
            "gt_classes": gt_classes,
            "max_classes": (ov.max(1) > 0).astype(np.int32),
            "max_overlaps": ov.max(1),
        })
        roidb[-1]["max_overlaps"][:2] = 1.0
    return roidb


def test_bbox_regression_targets_normalized(roidb_2im):
    means, stds = ms.add_bbox_regression_targets(roidb_2im, num_classes=2)
    assert means.shape == (8,) and stds.shape == (8,)
    # normalized fg targets: empirical mean ~0, std ~1 per class 1
    rows = np.vstack([e["bbox_targets"] for e in roidb_2im])
    fg = rows[rows[:, 0] == 1, 1:]
    assert fg.shape[0] >= 4
    np.testing.assert_allclose(fg.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(fg.std(axis=0), 1.0, atol=1e-4)


def test_project_rois_level_rule():
    # 224x224 box at scale 1 is exactly the target area -> level of 1.0
    rois = np.array([[0, 0, 223, 223], [0, 0, 55, 55]], np.float32)
    scaled, levels = ms.project_im_rois_multiscale(rois, [1.0, 2.0, 4.0])
    assert levels[0, 0] == 0          # 224^2 * 1 nearest
    assert levels[1, 0] == 2          # 56^2 * 16 = 224^2 exactly
    np.testing.assert_allclose(scaled[1], rois[1] * 4.0)


def test_minibatch_multiscale_blobs(roidb_2im, monkeypatch):
    monkeypatch.setattr(cfg, "IS_MULTISCALE", True)
    monkeypatch.setattr(cfg.TRAIN, "SCALES_BASE", (1.0, 2.0))
    monkeypatch.setattr(cfg.TRAIN, "BATCH_SIZE", 16)
    ms.add_bbox_regression_targets(roidb_2im, num_classes=2)
    rng = np.random.RandomState(0)
    blobs = ms.get_minibatch_multiscale(roidb_2im, num_classes=2, rng=rng)
    # pyramid blob: 2 images x 2 scales, padded to the largest (scale 2)
    assert blobs["data"].shape == (4, 120, 160, 3)
    assert blobs["rois"].shape == (16, 5)
    # batch indices address existing pyramid slabs
    assert blobs["rois"][:, 0].min() >= 0
    assert blobs["rois"][:, 0].max() <= 3
    # rois are scaled into their level (inside the level's extent)
    lv_scale = np.asarray([1.0, 2.0, 1.0, 2.0])[
        blobs["rois"][:, 0].astype(int)]
    assert (blobs["rois"][:, 3] <= 80 * lv_scale - 1 + 1e-5).all()
    assert blobs["labels"].shape == (16,)
    # fg fraction respected (4 fg-capable boxes per image)
    n_fg = int((blobs["labels"] > 0).sum())
    assert 1 <= n_fg <= int(round(cfg.TRAIN.FG_FRACTION * 16))
    # expanded targets: nonzero only in the label's 4-col slot
    t = blobs["bbox_targets"]
    w = blobs["bbox_inside_weights"]
    assert t.shape == (16, 8) and w.shape == (16, 8)
    fg_rows = blobs["labels"] > 0
    assert (w[fg_rows, 4:] == 1).all() and (w[:, :4] == 0).all()
    assert (t[~fg_rows] == 0).all()
    assert (blobs["bbox_outside_weights"] == (w > 0)).all()


@pytest.mark.slow
def test_fast_rcnn_multiscale_train_step(roidb_2im, monkeypatch):
    """End-to-end IS_MULTISCALE training slice: pyramid minibatch ->
    padded static blobs -> one no-RPN Fast R-CNN step, loss finite and
    decreasing over a few iterations."""
    import jax
    import numpy as np
    from mv3d_tf_tpu.faster_rcnn_2d import build_fast_rcnn_train_step
    from mv3d_tf_tpu.models import vggnet

    monkeypatch.setattr(cfg, "IS_MULTISCALE", True)
    monkeypatch.setattr(cfg.TRAIN, "SCALES_BASE", (1.0, 2.0))
    monkeypatch.setattr(cfg.TRAIN, "BATCH_SIZE", 32)
    ms.add_bbox_regression_targets(roidb_2im, num_classes=2)
    rng = np.random.RandomState(0)

    params = vggnet.init_params_2d(jax.random.PRNGKey(0), n_classes=2)
    step, tx = build_fast_rcnn_train_step(
        n_levels=4, bucket_hw=(160, 160), rois_per_batch=32, n_classes=2)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(3):
        blobs = ms.get_minibatch_multiscale(roidb_2im, num_classes=2,
                                            rng=rng)
        batch = ms.pad_minibatch_multiscale(blobs, (160, 160),
                                            rois_per_batch=32)
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, k)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_solver_dispatch_fast_rcnn(roidb_2im, monkeypatch, tmp_path):
    """train_net_2d honors HAS_RPN=False -> no-RPN Fast R-CNN training
    over precomputed proposals, with a checkpoint written."""
    import glob
    from mv3d_tf_tpu import solver

    monkeypatch.setattr(cfg, "IS_MULTISCALE", True)
    monkeypatch.setattr(cfg.TRAIN, "HAS_RPN", False)
    monkeypatch.setattr(cfg.TRAIN, "SCALES_BASE", (1.0,))
    monkeypatch.setattr(cfg.TRAIN, "BATCH_SIZE", 32)
    monkeypatch.setattr(cfg.TRAIN, "SNAPSHOT_ITERS", 2)
    monkeypatch.setattr(cfg.TRAIN, "DISPLAY", 1)

    class TinyImdb:
        num_classes = 2
        num_images = 2

    out = str(tmp_path / "out")
    import os
    os.makedirs(out, exist_ok=True)
    solver.train_net_2d(TinyImdb(), roidb_2im, out, max_iters=2,
                        bucket_hw=(96, 96), log=lambda *a: None)
    assert glob.glob(out + "/*iter_2*"), "no snapshot written"


class _FakeImdb:
    """Minimal imdb shim for the gt_data_layer roidb math."""

    def __init__(self, roidb):
        self._roidb = roidb
        self.image_index = list(range(len(roidb)))
        self.num_classes = 2

    @property
    def roidb(self):
        return self._roidb

    def image_path_at(self, i):
        return self._roidb[i]["image"]


def test_prepare_gt_roidb_info_boxes(roidb_2im):
    """gt_data_layer/roidb.py:22-92 info_boxes layout + math: grid cells
    clearing FG_THRESH per scale, columns laid out exactly, targets =
    scale-invariant deltas vs the assigned rescaled gt."""
    # keep only the gt rows — the gt data layer rates the GRID, not
    # proposals
    for e in roidb_2im:
        e["boxes"] = e["boxes"][:2]
        e["gt_classes"] = e["gt_classes"][:2]
        e["gt_overlaps"] = np.eye(2, dtype=np.float32)[:, :2]
    imdb = _FakeImdb(roidb_2im)
    scales = (1.0, 2.0)
    ms.prepare_gt_roidb(imdb, scales=scales, scale_mapping=(1, 1),
                        fg_thresh=0.3)
    from mv3d_tf_tpu.data.boxes_grid import get_boxes_grid
    from mv3d_tf_tpu.ops.iou import bbox_overlaps
    for e in roidb_2im:
        ib = e["info_boxes"]
        assert ib.shape[1] == 18 and ib.shape[0] > 0
        assert set(np.unique(ib[:, 2])) <= {0.0, 1.0}   # scale_ind
        assert (ib[:, 7] == 1).all()                    # scale_ind_map
        assert (ib[:, 12] == 1).all() and (ib[:, 13] == 0).all()
        # mapped box = grid box * scale_map / scale, per row
        scale = np.asarray(scales)[ib[:, 2].astype(int)]
        np.testing.assert_allclose(ib[:, 8:12],
                                   ib[:, 3:7] * (2.0 / scale[:, None]),
                                   rtol=1e-6)
        # independent recomputation of one scale's fg selection
        grid, cx, cy = get_boxes_grid(60, 80)
        ov = np.asarray(bbox_overlaps(grid.astype(np.float32),
                                      e["boxes"].astype(np.float32)))
        fg = np.where((e["gt_classes"][ov.argmax(1)] == 1)
                      & (ov.max(1) >= 0.3))[0]
        rows0 = ib[ib[:, 2] == 0]
        assert rows0.shape[0] == len(fg)
        np.testing.assert_allclose(rows0[:, 0], cx[fg], rtol=1e-6)
        np.testing.assert_allclose(rows0[:, 3:7], grid[fg], rtol=1e-6)
        exp_t = ms.compute_bbox_targets(
            grid[fg].astype(np.float64),
            e["boxes"][ov.argmax(1)[fg]].astype(np.float64))
        np.testing.assert_allclose(rows0[:, 14:], exp_t, atol=1e-6)


def test_info_boxes_regression_normalization(roidb_2im):
    for e in roidb_2im:
        e["boxes"] = e["boxes"][:2]
        e["gt_classes"] = e["gt_classes"][:2]
        e["gt_overlaps"] = np.eye(2, dtype=np.float32)[:, :2]
    imdb = _FakeImdb(roidb_2im)
    ms.prepare_gt_roidb(imdb, scales=(1.0, 2.0), scale_mapping=(0, 1),
                        fg_thresh=0.3)
    means, stds = ms.add_info_boxes_regression_targets(roidb_2im)
    assert means.shape == (8,) and stds.shape == (8,)
    rows = np.vstack([e["info_boxes"] for e in roidb_2im])
    fg = rows[rows[:, 12] == 1, 14:]
    np.testing.assert_allclose(fg.mean(axis=0), 0.0, atol=1e-4)
    # std ~1 only where the reference's coord-0 guard divided
    if stds[4] != 0:
        np.testing.assert_allclose(fg.std(axis=0)[stds[4:] > 1e-9], 1.0,
                                   atol=1e-3)


def test_get_minibatch_gt_blobs(roidb_2im, monkeypatch):
    monkeypatch.setattr(cfg.TRAIN, "SCALES_BASE", (1.0, 2.0))
    for e in roidb_2im:
        e["boxes"] = e["boxes"][:2]
        e["gt_classes"] = e["gt_classes"][:2]
        e["gt_overlaps"] = np.eye(2, dtype=np.float32)[:, :2]
    imdb = _FakeImdb(roidb_2im)
    scales = (1.0, 2.0)
    ms.prepare_gt_roidb(imdb, scales=scales, scale_mapping=(0, 1),
                        fg_thresh=0.3)
    before = [e["info_boxes"].copy() for e in roidb_2im]
    blobs = ms.get_minibatch_gt(roidb_2im, scales=scales,
                                scale_mapping=(0, 1),
                                aspects=(1, 0.5),
                                aspect_heights=(1.0, 2.0),
                                aspect_widths=(1.0, 0.5))
    # pyramid blob: 2 images x 2 base scales
    assert blobs["data"].shape[0] == 4
    ib = blobs["info_boxes"]
    n0 = len(before[0])
    # image 1's rows shifted by 1 * num_scale in cols 2 and 7
    np.testing.assert_allclose(ib[n0:, 2] - before[1][:, 2], 2.0)
    np.testing.assert_allclose(ib[n0:, 7] - before[1][:, 7], 2.0)
    # the roidb itself is NOT mutated (the reference's in-place shift
    # compounds across epochs — deliberately fixed here)
    for e, b in zip(roidb_2im, before):
        np.testing.assert_array_equal(e["info_boxes"], b)
    # parameters blob layout (minibatch.py:39-48)
    p = blobs["parameters"]
    assert p.shape == (2 + 2 * 2 + 2 * 2,)
    np.testing.assert_allclose(p[:2], [2, 2])
    np.testing.assert_allclose(p[2:4], scales)
    np.testing.assert_allclose(p[4:6], [0, 1])
    np.testing.assert_allclose(p[6:8], [1.0, 2.0])
    np.testing.assert_allclose(p[8:10], [1.0, 0.5])
