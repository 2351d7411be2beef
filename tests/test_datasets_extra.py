"""imdb base utilities, Pascal VOC + voc_eval AP, KITTI AP, kitti_raw."""

import os
import os.path as osp

import numpy as np
import pytest

from mv3d_tf_tpu.data.imdb_base import Imdb
from mv3d_tf_tpu.data.kitti_eval import ap_r40, evaluate_bev_ap
from mv3d_tf_tpu.data.pascal_voc import PascalVOC, voc_ap


class _FakeImdb(Imdb):
    def __init__(self, roidb, widths):
        super().__init__("fake")
        self._classes = ("__background__", "thing")
        self._image_index = [str(i) for i in range(len(roidb))]
        self._roidb = roidb
        self._widths = widths

    def _image_width(self, i):
        return self._widths[i]


def test_append_flipped_images():
    roidb = [{"boxes": np.array([[10, 5, 30, 25]], np.float32),
              "gt_classes": np.array([1]), "flipped": False}]
    db = _FakeImdb(roidb, widths=[100])
    db.append_flipped_images()
    assert len(db.roidb) == 2 and db.num_images == 2
    np.testing.assert_allclose(db.roidb[1]["boxes"][0], [69, 5, 89, 25])
    assert db.roidb[1]["flipped"]


def test_evaluate_recall_perfect():
    gt = np.array([[10, 10, 50, 50]], np.float32)
    roidb = [{"boxes": np.vstack([gt, gt + 1]),
              "gt_classes": np.array([1, 0]), "flipped": False}]
    db = _FakeImdb(roidb, widths=[100])
    res = db.evaluate_recall()
    assert res["recalls"][0] == 1.0      # IoU .5 recall with near-gt boxes


def test_evaluate_proposals_ar():
    """imdb2.py:161-201 variant: greedy matching, fine grid,
    AR = 2*trapz. Perfect proposals -> AR 1; an empty-candidate frame
    contributes no gt slots (imdb2.py:170-171)."""
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
    roidb = [{"boxes": gt.copy(), "gt_classes": np.array([1, 1]),
              "flipped": False},
             {"boxes": gt.copy(), "gt_classes": np.array([1, 1]),
              "flipped": False}]
    db = _FakeImdb(roidb, widths=[100, 100])
    cands = [gt.copy(), np.zeros((0, 4), np.float32)]
    ar, gt_ov, recalls, thresholds = db.evaluate_proposals(cands)
    assert gt_ov.shape == (2,)            # frame 2 skipped entirely
    np.testing.assert_allclose(gt_ov, 1.0)
    np.testing.assert_allclose(recalls, 1.0)
    np.testing.assert_allclose(ar, 2 * np.trapz(recalls, thresholds))
    assert abs(ar - 1.0) < 0.01
    # one proposal at IoU just over 0.5 for one gt, none for the other:
    # greedy matching must not double-assign
    half = np.array([[10, 10, 50, 30]], np.float32)    # IoU ~0.5 w/ gt0
    ar2, gt_ov2, recalls2, _ = db.evaluate_proposals(
        [half, np.zeros((0, 4), np.float32)])
    assert gt_ov2.shape == (2,)
    assert (gt_ov2 > 0).sum() == 1
    assert recalls2[-1] == 0.0


def test_create_roidb_from_box_list():
    gt_roidb = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
                 "gt_classes": np.array([1])}]
    db = _FakeImdb([{}], widths=[100])
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    out = db.create_roidb_from_box_list([boxes], gt_roidb)
    assert out[0]["gt_overlaps"][0, 1] == 1.0
    assert out[0]["gt_overlaps"][1, 1] == 0.0


def test_voc_ap_metrics():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    ap = voc_ap(rec, prec, use_07_metric=False)
    assert 0 < ap07 <= 1 and 0 < ap <= 1
    # perfect detector
    assert voc_ap(np.array([1.0]), np.array([1.0]), True) == pytest.approx(1.0)


def test_kitti_bev_ap_perfect_and_noisy():
    gt = [np.array([[10, 10, 50, 50], [100, 100, 140, 140]], np.float32)]
    perfect = [np.array([[10, 10, 50, 50, 0.9],
                         [100, 100, 140, 140, 0.8]], np.float32)]
    res = evaluate_bev_ap(perfect, gt, iou_thresh=0.7)
    assert res["ap"] == pytest.approx(1.0)
    # one false positive with higher score lowers precision but recall holds
    noisy = [np.vstack([perfect[0],
                        np.array([[300, 300, 340, 340, 0.95]])])]
    res2 = evaluate_bev_ap(noisy, gt, iou_thresh=0.7)
    assert 0 < res2["ap"] < 1.0
    # duplicate detections of one gt: second is a false positive
    dup = [np.array([[10, 10, 50, 50, 0.9], [10, 10, 50, 50, 0.85]],
                    np.float32)]
    res3 = evaluate_bev_ap(dup, [gt[0][:1]], iou_thresh=0.7)
    assert res3["ap"] == pytest.approx(1.0)  # gt found at rank 1


def test_ap_r40_bounds():
    assert ap_r40(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    assert ap_r40(np.array([0.01]), np.array([1.0])) == pytest.approx(0.0)


@pytest.fixture
def voc_root(tmp_path):
    d = tmp_path / "VOCdevkit" / "VOC2007"
    (d / "ImageSets" / "Main").mkdir(parents=True)
    (d / "Annotations").mkdir()
    (d / "JPEGImages").mkdir()
    (d / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    (d / "Annotations" / "000001.xml").write_text("""
<annotation><object><name>car</name><difficult>0</difficult>
<bndbox><xmin>11</xmin><ymin>21</ymin><xmax>61</xmax><ymax>81</ymax></bndbox>
</object><object><name>person</name><difficult>1</difficult>
<bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax><ymax>5</ymax></bndbox>
</object></annotation>""")
    from PIL import Image
    Image.new("RGB", (200, 150)).save(d / "JPEGImages" / "000001.jpg")
    return str(tmp_path / "VOCdevkit")


def test_pascal_voc_parse_and_eval(voc_root, monkeypatch, tmp_path):
    from mv3d_tf_tpu.config import cfg
    monkeypatch.setattr(cfg, "DATA_DIR", str(tmp_path / "cache_root"))
    db = PascalVOC("train", "2007", voc_root)
    assert db.num_images == 1
    entry = db.roidb[0]
    # difficult object excluded; 0-based coords
    assert entry["boxes"].shape == (1, 4)
    np.testing.assert_array_equal(entry["boxes"][0], [10, 20, 60, 80])
    assert entry["gt_classes"][0] == db._class_to_ind["car"]
    # perfect detection -> AP 1.0 for car
    all_boxes = [[[] for _ in range(1)] for _ in range(db.num_classes)]
    all_boxes[db._class_to_ind["car"]][0] = np.array(
        [[10, 20, 60, 80, 0.99]], np.float32)
    aps = db.evaluate_detections(all_boxes)
    assert aps["car"] == pytest.approx(1.0, abs=1e-6)


def test_kitti_raw(tmp_path):
    seq = tmp_path / "2011_09_26_drive_0001"
    (seq / "gt_boxes3d").mkdir(parents=True)
    from mv3d_tf_tpu import geometry as G
    box = np.asarray(G.lidar_3d_to_corners(
        np.array([[20.0, 3.0, -0.8, 4.0, 1.6, 1.5]], np.float32)))
    np.save(seq / "gt_boxes3d" / "0000000000.npy", box)
    from mv3d_tf_tpu.data.kitti_raw import KittiRaw
    db = KittiRaw("2011_09_26_drive_0001", str(tmp_path))
    assert db.num_images == 1
    e = db.roidb[0]
    np.testing.assert_allclose(e["boxes_3D"][0, :3], [20, 3, -0.8], atol=1e-4)
    np.testing.assert_allclose(e["boxes_3D"][0, 3:], [4.0, 1.6, 1.5],
                               atol=1e-4)


def test_pascal_voc_region_proposal_roidb(voc_root, monkeypatch, tmp_path):
    """pascal_voc2.py:432-500 parity: txt proposals merged with gt."""
    from mv3d_tf_tpu.config import cfg
    monkeypatch.setattr(cfg, "DATA_DIR", str(tmp_path / "cache_root"))
    monkeypatch.setattr(cfg, "REGION_PROPOSAL", "RPN")
    rp = (tmp_path / "VOCdevkit" / "region_proposals" / "RPN" / "training")
    rp.mkdir(parents=True)
    # 3 proposals, one degenerate (x2<=x1) that must be dropped
    (rp / "000001.txt").write_text(
        "10 20 60 80 0.9\n5 5 50 50 0.4\n30 30 20 40 0.8\n")
    db = PascalVOC("train", "2007", voc_root)
    roidb = db.region_proposal_roidb()
    assert len(roidb) == 1
    # 2 kept proposals + 1 gt (difficult excluded) merged
    assert roidb[0]["boxes"].shape == (3, 4)
    # proposal rows carry overlap-vs-gt, gt row is one-hot
    assert roidb[0]["gt_overlaps"].max() == 1.0
    assert (roidb[0]["gt_classes"] > 0).sum() == 1


def test_pascal_voc_selective_search_roidb(voc_root, monkeypatch, tmp_path):
    """pascal_voc2.py:502-543 parity: .mat boxes [y1 x1 y2 x2] 1-based."""
    import scipy.io as sio
    from mv3d_tf_tpu.config import cfg
    monkeypatch.setattr(cfg, "DATA_DIR", str(tmp_path / "cache_root"))
    ss = tmp_path / "VOCdevkit" / "selective_search_data"
    ss.mkdir(parents=True)
    boxes = np.array([[21, 11, 81, 61], [6, 6, 51, 51]], np.float64)
    cell = np.empty((1, 1), object)
    cell[0, 0] = boxes
    sio.savemat(str(ss / "voc_2007_train.mat"), {"boxes": cell})
    db = PascalVOC("train", "2007", voc_root)
    roidb = db.selective_search_roidb()
    # [y1 x1 y2 x2] 1-based -> [x1 y1 x2 y2] 0-based; first box == gt box
    np.testing.assert_array_equal(roidb[0]["boxes"][0], [10, 20, 60, 80])
    assert roidb[0]["gt_overlaps"][0].max() == pytest.approx(1.0)
    # proposal recall helper: perfect proposal set -> recall 1.0
    all_boxes = [[[] for _ in range(1)] for _ in range(db.num_classes)]
    all_boxes[7][0] = np.array([[10, 20, 60, 80, 0.9]], np.float32)
    assert db.evaluate_proposals(all_boxes) == pytest.approx(1.0)
