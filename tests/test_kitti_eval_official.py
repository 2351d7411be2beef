"""Official-protocol KITTI AP: difficulty buckets, ignore rules, 3 metrics."""

import numpy as np

from mv3d_tf_tpu.data.kitti_eval import (DIFFICULTY, corners_to_aabb3d,
                                         evaluate_ap_difficulty, gt_levels,
                                         iou_2d, iou_3d_aabb)


def _frame(dets, scores, det_h, gts, levels, iou=iou_2d):
    return {"dets": np.asarray(dets, np.float32),
            "scores": np.asarray(scores, np.float32),
            "det_heights": np.asarray(det_h, np.float32),
            "gts": np.asarray(gts, np.float32),
            "levels": np.asarray(levels, np.int32), "iou": iou}


def test_gt_levels_reference_thresholds():
    boxes = np.array([[0, 0, 10, 50],    # h=51 -> easy
                      [0, 0, 10, 30],    # h=31 -> moderate (occ 1)
                      [0, 0, 10, 30],    # h=31 -> hard (trunc .4)
                      [0, 0, 10, 10]],   # h=11 -> excluded
                     np.float32)
    trunc = np.array([0.0, 0.1, 0.4, 0.0], np.float32)
    occ = np.array([0, 1, 2, 0], np.float32)
    assert gt_levels(boxes, trunc, occ).tolist() == [1, 2, 3, 4]


def test_perfect_detections_ap1():
    gts = np.array([[0, 0, 40, 60], [100, 100, 150, 170]], np.float32)
    levels = np.array([1, 1])
    fr = _frame(gts, [0.9, 0.8], [61, 71], gts, levels)
    for diff in ("easy", "moderate", "hard"):
        res = evaluate_ap_difficulty([fr], 0.7, diff)
        assert res["ap"] == 1.0, (diff, res)


def test_harder_gt_is_ignored_not_fp():
    """A detection matching only a harder-bucket gt is neither TP nor FP;
    the harder gt does not count toward npos at the easier bucket."""
    gts = np.array([[0, 0, 40, 60], [100, 100, 140, 130]], np.float32)
    levels = np.array([1, 3])          # second gt is hard-only
    dets = gts.copy()
    fr = _frame(dets, [0.9, 0.8], [61, 31], gts, levels)
    easy = evaluate_ap_difficulty([fr], 0.7, "easy")
    assert easy["num_gt"] == 1 and easy["ap"] == 1.0
    hard = evaluate_ap_difficulty([fr], 0.7, "hard")
    assert hard["num_gt"] == 2 and hard["ap"] == 1.0


def test_short_unmatched_detection_is_ignored():
    gts = np.array([[0, 0, 40, 60]], np.float32)
    dets = np.array([[0, 0, 40, 60], [500, 500, 520, 520]], np.float32)
    # the stray detection is 21px tall: < easy min height 40 -> ignored
    fr = _frame(dets, [0.9, 0.8], [61, 21], gts, [1])
    res = evaluate_ap_difficulty([fr], 0.7, "easy")
    assert res["ap"] == 1.0
    # a TALL stray detection scored ABOVE the TP is a real FP and halves
    # the interpolated precision at every recall point
    fr2 = _frame(dets, [0.8, 0.9], [61, 62], gts, [1])
    res2 = evaluate_ap_difficulty([fr2], 0.7, "easy")
    assert abs(res2["ap"] - 0.5) < 1e-9


def test_3d_aabb_iou_and_corner_conversion():
    cnr = np.zeros((1, 24), np.float32)
    cnr[0, 0:8] = [1, 1, -1, -1, 1, 1, -1, -1]       # x: [-1, 1]
    cnr[0, 8:16] = [2, -2, -2, 2, 2, -2, -2, 2]      # y: [-2, 2]
    cnr[0, 16:24] = [0, 0, 0, 0, 3, 3, 3, 3]         # z: [0, 3]
    aabb = corners_to_aabb3d(cnr)
    np.testing.assert_allclose(aabb[0], [-1, -2, 0, 1, 2, 3])
    # identical boxes -> IoU 1; half-shifted in z -> 0.5/1.5
    iou = iou_3d_aabb(aabb, aabb)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)
    b = aabb.copy()
    b[0, 2] += 1.5
    b[0, 5] += 1.5
    np.testing.assert_allclose(iou_3d_aabb(aabb, b)[0, 0], 1.5 / 4.5,
                               atol=1e-6)


def test_official_table_on_synthetic_imdb(tmp_path):
    """Perfect 'detections' (= the gt itself) score AP 1.0 everywhere on
    the synthetic dataset; the 3x3 table prints."""
    from mv3d_tf_tpu.data import synthetic
    from mv3d_tf_tpu.data.kitti import KittiMV3D
    from mv3d_tf_tpu.data.kitti_eval import evaluate_kitti_official
    from mv3d_tf_tpu.config import cfg

    root = tmp_path / "kitti"
    synthetic.generate(str(root), num_frames=3, cars_per_frame=2, seed=3,
                       splits=("train",))
    imdb = KittiMV3D("train", kitti_path=str(root))
    # isolate the roidb cache from the shared data/cache directory
    imdb._roidb = [imdb._load_kitti_annotation(idx)
                   for idx in imdb._image_index]

    all_boxes = [[], []]
    all_cnr = [[], []]
    for i in range(imdb.num_images):
        e = imdb.roidb[i]
        m = e["gt_classes"] == 1
        n = int(m.sum())
        scores = np.linspace(0.9, 0.5, n)[:, None].astype(np.float32)
        all_boxes[1].append(np.hstack([e["boxes_bv"][m], scores]))
        all_cnr[1].append(np.hstack([e["boxes_corners"][m], scores]))
        all_boxes[0].append(np.zeros((0, 5), np.float32))
        all_cnr[0].append(np.zeros((0, 25), np.float32))

    table = evaluate_kitti_official(imdb, all_boxes, all_cnr)
    for metric in ("2d", "bev", "3d"):
        levels_seen = False
        for diff in ("easy", "moderate", "hard"):
            ap = table[metric][diff]
            assert ap in (0.0, 1.0) or 0 <= ap <= 1
        # hard bucket includes every labeled car -> must be perfect
        assert table[metric]["hard"] == 1.0, (metric, table)


def test_quality_mode_regressed_corner_table(tmp_path):
    """The quality-mode table (derive_bev_from_corners + proper
    projection) scores gt-perfect REGRESSED corners at AP 1.0 even when
    the parity-mode inputs (axis-aligned unregressed boxes) would not —
    the structural cause of the near-zero official 2d/3d AP
    (kitti.evaluate_detections docstring)."""
    from mv3d_tf_tpu.data import synthetic
    from mv3d_tf_tpu.data.kitti import KittiMV3D
    from mv3d_tf_tpu.data.kitti_eval import (_corners_to_bv_np,
                                             evaluate_kitti_official)

    root = tmp_path / "kitti"
    synthetic.generate(str(root), num_frames=3, cars_per_frame=2, seed=5,
                       splits=("train",))
    imdb = KittiMV3D("train", kitti_path=str(root))
    imdb._roidb = [imdb._load_kitti_annotation(idx)
                   for idx in imdb._image_index]

    all_boxes = [[], []]      # deliberately WRONG bev boxes (all zeros)
    all_cnr_r = [[], []]      # gt corners = perfect corner regression
    for i in range(imdb.num_images):
        e = imdb.roidb[i]
        m = e["gt_classes"] == 1
        n = int(m.sum())
        scores = np.linspace(0.9, 0.5, n)[:, None].astype(np.float32)
        all_boxes[1].append(np.hstack(
            [np.zeros((n, 4), np.float32), scores]))
        all_cnr_r[1].append(np.hstack([e["boxes_corners"][m], scores]))
        all_boxes[0].append(np.zeros((0, 5), np.float32))
        all_cnr_r[0].append(np.zeros((0, 25), np.float32))

    # parity path on the zeroed bev boxes: bev AP must be 0
    t0 = evaluate_kitti_official(imdb, all_boxes, all_cnr_r)
    assert t0["bev"]["hard"] == 0.0
    # quality mode re-derives bev from the corners -> perfect
    t1 = evaluate_kitti_official(imdb, all_boxes, all_cnr_r,
                                 projection="proper",
                                 derive_bev_from_corners=True,
                                 label="quality mode (regressed corners)")
    for metric in ("2d", "bev", "3d"):
        assert t1[metric]["hard"] == 1.0, (metric, t1)


def test_corners_to_bv_np_twin():
    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.data.kitti_eval import _corners_to_bv_np
    rng = np.random.RandomState(0)
    cnr = np.zeros((7, 24), np.float32)
    cnr[:, 0:8] = rng.rand(7, 8) * 50
    cnr[:, 8:16] = rng.rand(7, 8) * 40 - 20
    cnr[:, 16:24] = rng.rand(7, 8) * 2 - 2
    assert np.abs(_corners_to_bv_np(cnr)
                  - np.asarray(G.corners_to_bv(cnr))).max() == 0.0


def test_evaluate_kitti_bev_num_frames_limits_gt():
    """num_frames restricts scoring to the detected prefix — without it
    a partial-split run's undetected frames dilute recall (the r5 gate
    at 128/256 frames read ~0.47 instead of ~0.95)."""
    from mv3d_tf_tpu.data.kitti_eval import evaluate_kitti_bev

    class _FakeImdb:
        num_images = 4

        def __init__(self):
            box = np.array([[10, 10, 30, 30]], np.float32)
            self.roidb = [{"gt_classes": np.array([1]),
                           "boxes_bv": box} for _ in range(4)]

    imdb = _FakeImdb()
    det = np.array([[10, 10, 30, 30, 0.9]], np.float32)
    empty = np.zeros((0, 5), np.float32)
    # perfect detections on frames 0-1, nothing on 2-3
    all_boxes = [[empty] * 4, [det, det, empty, empty]]
    full = evaluate_kitti_bev(imdb, all_boxes, iou_thresh=0.5)["ap"]
    part = evaluate_kitti_bev(imdb, all_boxes, iou_thresh=0.5,
                              num_frames=2)["ap"]
    assert abs(full - 0.5) < 0.01
    assert abs(part - 1.0) < 0.01
