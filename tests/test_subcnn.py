"""SubCNN legacy surface: ds_utils, boxes_grid, voxel-exemplar
annotations, region-proposal roidbs, viewpoint eval writers, COCO AP
(VERDICT r1 item 7)."""

import json
import os.path as osp

import numpy as np
import pytest

from mv3d_tf_tpu.data import ds_utils
from mv3d_tf_tpu.data.boxes_grid import get_boxes_grid


def test_ds_utils_roundtrip_and_filters():
    boxes = np.array([[10, 20, 30, 40], [10, 20, 30, 40], [5, 5, 9, 9]],
                     np.float64)
    u = ds_utils.unique_boxes(boxes)
    assert list(u) == [0, 2]
    xywh = ds_utils.xyxy_to_xywh(boxes)
    np.testing.assert_array_equal(xywh[0], [10, 20, 21, 21])
    np.testing.assert_array_equal(ds_utils.xywh_to_xyxy(xywh), boxes)
    ds_utils.validate_boxes(boxes, width=50, height=50)
    with pytest.raises(AssertionError):
        ds_utils.validate_boxes(boxes, width=30, height=50)
    keep = ds_utils.filter_small_boxes(boxes, min_size=10)
    assert list(keep) == [0, 1]       # w=20>=10 & h=20>10; third is 4x4


def test_boxes_grid_shapes_and_area():
    boxes, cx, cy = get_boxes_grid(200, 300, scale=1.0, kernel_size=5,
                                   aspects=(1, 0.5), spatial_scale=0.0625,
                                   net_name="VGGnet")
    # VGGnet heatmap: 4 halvings with +0.5 rounding
    h = w = None
    hh = 200.0
    ww = 300.0
    for _ in range(4):
        hh = np.floor(hh / 2.0 + 0.5)
        ww = np.floor(ww / 2.0 + 0.5)
    assert boxes.shape == (int(hh) * int(ww) * 2, 4)
    assert cx.shape[0] == boxes.shape[0] // 2 * 1 or cx.shape[0] > 0
    # aspect 1 box: width == height == kernel_size / spatial_scale... in
    # image coords area is (k/ss)^2
    wdt = boxes[0, 2] - boxes[0, 0]
    hgt = boxes[0, 3] - boxes[0, 1]
    assert wdt == pytest.approx(5 / 0.0625)
    assert hgt == pytest.approx(5 / 0.0625)
    # aspect 0.5 (h/w): box 1 of cell 0
    wdt2 = boxes[1, 2] - boxes[1, 0]
    hgt2 = boxes[1, 3] - boxes[1, 1]
    assert hgt2 / wdt2 == pytest.approx(0.5)
    assert wdt2 * hgt2 == pytest.approx((5 / 0.0625) ** 2)


@pytest.fixture
def exemplar_file(tmp_path):
    # rows: class subcls is_flip x1 y1 x2 y2 (1-based in pascal3d mode)
    (tmp_path / "a.txt").write_text(
        "car 3 0 11 21 61 81\n"
        "car -1 0 1 1 5 5\n"          # subcls -1 dropped
        "car 7 1 11 21 61 81\n")      # flipped twin of row 0
    return str(tmp_path / "a.txt")


def test_voxel_exemplar_annotation(exemplar_file):
    from mv3d_tf_tpu.data import subcnn
    cti = {"__background__": 0, "car": 1}
    e = subcnn.load_voxel_exemplar_annotation(exemplar_file, cti, 2,
                                              zero_based=True)
    assert e["boxes"].shape == (1, 4)
    np.testing.assert_array_equal(e["boxes"][0], [10, 20, 60, 80])
    assert e["gt_subclasses"][0] == 3
    assert e["gt_subclasses_flipped"][0] == 7
    assert e["gt_subindexes"][0, 1] == 3
    assert e["gt_subindexes_flipped"][0, 1] == 7
    assert e["gt_overlaps"][0, 1] == 1.0
    # kitti mode keeps 1-based coords
    e2 = subcnn.load_voxel_exemplar_annotation(exemplar_file, cti, 2,
                                               zero_based=False)
    np.testing.assert_array_equal(e2["boxes"][0], [11, 21, 61, 81])


def test_subclass_mapping(tmp_path):
    from mv3d_tf_tpu.data import subcnn
    (tmp_path / "mapping.txt").write_text(
        "0 car 12.5 0.3\n1 car 45.0 -0.7\n2 bus 90.0 1.1\n")
    names, az = subcnn.parse_subclass_mapping(
        str(tmp_path / "mapping.txt"), value_col=2)
    assert names == ["car", "car", "bus"]
    np.testing.assert_allclose(az, [12.5, 45.0, 90.0])
    mapping = subcnn.subclass_mapping_to_class_ind(
        names, {"car": 1, "bus": 2})
    np.testing.assert_array_equal(mapping, [1, 1, 2])


def test_anchor_and_grid_coverage():
    from mv3d_tf_tpu.data import subcnn
    boxes = np.array([[100, 100, 180, 160]], np.float32)   # car-sized
    gt_classes = np.array([1], np.int32)
    num_all, num_cov = subcnn.anchor_coverage(boxes, gt_classes, 375,
                                              1242, 2, scale=1.0,
                                              fg_thresh=0.5)
    assert num_all[1] == 1 and num_cov[1] == 1
    a2, c2 = subcnn.grid_coverage(boxes, gt_classes, 375, 1242, 2,
                                  scales=(1.0,), fg_thresh=0.99,
                                  scale=1.0, kernel_size=5,
                                  aspects=(1.0,), spatial_scale=0.0625,
                                  net_name="VGGnet")
    assert a2[1] == 1 and c2[1] == 0   # nothing covers at IoU .99
    # empty gt
    a3, c3 = subcnn.anchor_coverage(np.zeros((0, 4), np.float32),
                                    np.zeros(0, np.int32), 375, 1242, 2)
    assert a3.sum() == 0 and c3.sum() == 0


@pytest.fixture
def pascal3d_root(tmp_path):
    devkit = tmp_path / "VOCdevkit2012" / "VOC2012"
    (devkit / "ImageSets" / "Main").mkdir(parents=True)
    (devkit / "Annotations").mkdir()
    (devkit / "JPEGImages").mkdir()
    (devkit / "ImageSets" / "Main" / "train.txt").write_text("img1\n")
    (devkit / "ImageSets" / "Main" / "val.txt").write_text("img1\n")
    (devkit / "Annotations" / "img1.xml").write_text("""
<annotation><object><name>car</name><difficult>0</difficult>
<bndbox><xmin>11</xmin><ymin>21</ymin><xmax>61</xmax><ymax>81</ymax></bndbox>
</object></annotation>""")
    from PIL import Image
    Image.new("RGB", (200, 150)).save(devkit / "JPEGImages" / "img1.jpg")
    ve = tmp_path / "voxel_exemplars"
    ve.mkdir()
    (ve / "img1.txt").write_text("car 3 0 11 21 61 81\ncar 7 1 11 21 61 81\n")
    (ve / "mapping.txt").write_text(
        "3 car 15.0\n7 car 195.0\n")
    return tmp_path


def test_pascal3d_train_and_val_gt(pascal3d_root, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Pascal3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(pascal3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", True)
    db = Pascal3D("train", str(pascal3d_root / "VOCdevkit2012"),
                  pascal3d_path=str(pascal3d_root))
    e = db.roidb[0]
    np.testing.assert_array_equal(e["boxes"][0], [10, 20, 60, 80])
    assert e["gt_subclasses"][0] == 3
    dbv = Pascal3D("val", str(pascal3d_root / "VOCdevkit2012"),
                   pascal3d_path=str(pascal3d_root))
    ev = dbv.roidb[0]
    np.testing.assert_array_equal(ev["boxes"][0], [10, 20, 60, 80])
    assert ev["gt_classes"][0] == db._class_to_ind["car"]


def test_pascal3d_eval_writes_azimuth(pascal3d_root, monkeypatch, tmp_path):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Pascal3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(pascal3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", True)
    db = Pascal3D("train", str(pascal3d_root / "VOCdevkit2012"),
                  pascal3d_path=str(pascal3d_root))
    all_boxes = [[[] for _ in range(1)] for _ in range(db.num_classes)]
    car = db._class_to_ind["car"]
    # columns: x1 y1 x2 y2 score subcls
    all_boxes[car][0] = np.array([[10, 20, 60, 80, 0.9, 3]], np.float64)
    out = tmp_path / "res"
    db.evaluate_detections(all_boxes, str(out))
    txt = (out / "det_train_car.txt").read_text()
    assert "img1" in txt and "15.000" in txt
    db.evaluate_detections_one_file(all_boxes, str(out))
    assert "car" in (out / "detections.txt").read_text()


def test_pascal3d_region_proposal_roidb(pascal3d_root, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Pascal3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(pascal3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", False)
    rp = pascal3d_root / "region_proposals" / "RPN" / "training"
    rp.mkdir(parents=True)
    (rp / "img1.txt").write_text("10 20 60 80 0.9\n30 30 20 40 0.8\n")
    db = Pascal3D("train", str(pascal3d_root / "VOCdevkit2012"),
                  pascal3d_path=str(pascal3d_root))
    roidb = db.roidb      # handler routes to region_proposal_roidb
    assert roidb[0]["boxes"].shape == (2, 4)   # 1 kept proposal + 1 gt
    assert (roidb[0]["gt_classes"] > 0).sum() == 1


@pytest.fixture
def imagenet3d_root(tmp_path):
    root = tmp_path / "imagenet3d"
    (root / "Images").mkdir(parents=True)
    (root / "Labels").mkdir()
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text("im1\n")
    (root / "Labels" / "im1.txt").write_text(
        "car 10 20 60 80 30.0 10.0 -5.0\n"
        "chair 5 5 50 50\n")
    from PIL import Image
    Image.new("RGB", (100, 100)).save(root / "Images" / "im1.jpg")
    return root


def test_imagenet3d_gt_and_viewpoints(imagenet3d_root, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Imagenet3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(imagenet3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", True)
    db = Imagenet3D("train", str(imagenet3d_root))
    assert db.num_classes == 101
    e = db.roidb[0]
    assert e["boxes"].shape == (2, 4)
    np.testing.assert_allclose(e["gt_viewpoints"][0], [30, 10, -5])
    np.testing.assert_allclose(e["gt_viewpoints_flipped"][0], [-30, 10, 5])
    assert np.isinf(e["gt_viewpoints"][1]).all()   # no viewpoint given


def test_imagenet3d_region_proposals_formats(imagenet3d_root, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Imagenet3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(imagenet3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", False)
    monkeypatch.setattr(cfg, "REGION_PROPOSAL", "selective_search")
    rp = imagenet3d_root / "region_proposals" / "selective_search"
    rp.mkdir(parents=True)
    # selective_search stores [y1 x1 y2 x2 score]
    (rp / "im1.txt").write_text("20 10 80 60 0.9\n")
    db = Imagenet3D("train", str(imagenet3d_root))
    roidb = db.roidb
    # proposal converted to [x1 y1 x2 y2] + 2 gt rows merged
    np.testing.assert_array_equal(roidb[0]["boxes"][0], [10, 20, 60, 80])
    assert roidb[0]["boxes"].shape == (3, 4)


def test_imagenet3d_eval_writer(imagenet3d_root, monkeypatch, tmp_path):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Imagenet3D
    monkeypatch.setattr(cfg, "DATA_DIR",
                        str(imagenet3d_root / "cache_root"))
    monkeypatch.setattr(cfg, "IS_RPN", True)
    db = Imagenet3D("train", str(imagenet3d_root))
    all_boxes = [[[] for _ in range(1)] for _ in range(db.num_classes)]
    car = db._class_to_ind["car"]
    # x1 y1 x2 y2 score subcls az el theta
    all_boxes[car][0] = np.array(
        [[10, 20, 60, 80, 0.9, 0, 30.0, 10.0, -5.0]], np.float64)
    out = tmp_path / "res"
    db.evaluate_detections(all_boxes, str(out))
    txt = (out / "im1.txt").read_text()
    assert txt.startswith("car ") and "30.0" in txt


@pytest.fixture
def tracking_root(tmp_path):
    root = tmp_path / "tracking"
    img = root / "training" / "image_02" / "0000"
    img.mkdir(parents=True)
    from PIL import Image
    for i in range(2):
        Image.new("RGB", (100, 100)).save(img / "{:06d}.png".format(i))
    (root / "training" / "label_02").mkdir()
    (root / "training" / "label_02" / "0000.txt").write_text(
        "0 1 Car 0 0 0.0 10 20 60 80 1.5 1.6 4.0 1 2 20 0.1\n")
    ve = root / "voxel_exemplars" / "trainval" / "0000"
    ve.mkdir(parents=True)
    (ve / "000000.txt").write_text(
        "Car 5 0 10 20 60 80\nCar 9 1 10 20 60 80\n")
    (root / "voxel_exemplars" / "trainval" / "mapping.txt").write_text(
        "5 Car x 0.7\n9 Car x -0.7\n")
    return root


def test_kitti_tracking_voxel_exemplars(tracking_root, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import KittiTracking
    monkeypatch.setattr(cfg, "IS_RPN", True)
    db = KittiTracking("training", "0000", str(tracking_root),
                       use_voxel_exemplars=True)
    roidb = db.gt_roidb()
    assert len(roidb) == 2
    assert roidb[0]["gt_subclasses"][0] == 5
    assert roidb[0]["gt_subclasses_flipped"][0] == 9
    assert roidb[1]["boxes"].shape == (0, 4)   # no exemplar file
    # label_02 path still works and now exposes 4 classes
    db2 = KittiTracking("training", "0000", str(tracking_root))
    assert db2.num_classes == 4
    assert db2.gt_roidb()[0]["gt_classes"][0] == 1


def test_kitti_tracking_region_proposals_and_eval(tracking_root,
                                                  monkeypatch, tmp_path):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import KittiTracking
    monkeypatch.setattr(cfg, "IS_RPN", False)
    monkeypatch.setattr(cfg, "REGION_PROPOSAL", "RPN")
    rp = (tracking_root / "region_proposals" / "RPN_trainval" /
          "training" / "0000")
    rp.mkdir(parents=True)
    (rp / "000000.txt").write_text("10 20 60 80 0.9\n")
    (rp / "000001.txt").write_text("")
    db = KittiTracking("training", "0000", str(tracking_root),
                       use_voxel_exemplars=True)
    roidb = db.roidb
    assert roidb[0]["boxes"].shape == (2, 4)   # proposal + gt
    # eval writer with subclass alpha
    all_boxes = [[[] for _ in range(2)] for _ in range(db.num_classes)]
    all_boxes[1][0] = np.array([[10, 20, 60, 80, 0.9, 5]], np.float64)
    out = tmp_path / "res"
    db.evaluate_detections(all_boxes, str(out))
    txt = (out / "000000.txt").read_text()
    assert txt.startswith("Car -1 -1 0.7")


def _boxes(*rows):
    a = np.asarray(rows, np.float64)
    return a[:, :4], a[:, 4]


def test_coco_ap_perfect_and_miss():
    from mv3d_tf_tpu.data.coco_eval import evaluate_category
    gt = {1: np.array([[10, 10, 40, 40]], np.float64),
          2: np.array([[0, 0, 20, 20]], np.float64)}
    dets = {1: _boxes([10, 10, 40, 40, 0.9]),
            2: _boxes([0, 0, 20, 20, 0.8])}
    ap = evaluate_category(gt, dets)
    np.testing.assert_allclose(ap, 1.0)
    # completely wrong boxes -> AP 0
    dets_bad = {1: _boxes([200, 200, 10, 10, 0.9]), 2: _boxes()} \
        if False else {1: _boxes([200, 200, 10, 10, 0.9])}
    ap0 = evaluate_category(gt, dets_bad)
    np.testing.assert_allclose(ap0, 0.0)
    # no gt -> None (category excluded)
    assert evaluate_category({1: np.zeros((0, 4))}, dets) is None


def test_coco_ap_localization_quality():
    """A det with IoU ~0.6 counts at t=0.5/0.55/0.6 but not above —
    AP@[.5:.95] lands strictly between 0 and 1."""
    from mv3d_tf_tpu.data.coco_eval import evaluate_category
    gt = {1: np.array([[0, 0, 100, 100]], np.float64)}
    dets = {1: _boxes([0, 0, 100, 60, 0.9])}   # IoU = 0.6
    ap = evaluate_category(gt, dets)
    assert ap[0] == 1.0          # @0.5
    assert ap[-1] == 0.0         # @0.95
    assert 0 < ap.mean() < 1


def test_coco_evaluate_detections_end_to_end(tmp_path, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.extra_datasets import Coco
    monkeypatch.setattr(cfg, "DATA_DIR", str(tmp_path / "cache_root"))
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "categories": [{"id": 18, "name": "dog"}],
        "annotations": [
            {"image_id": 1, "category_id": 18, "bbox": [10, 10, 30, 30],
             "iscrowd": 0},
            {"image_id": 2, "category_id": 18, "bbox": [5, 5, 20, 20],
             "iscrowd": 0}],
    }
    (ann_dir / "instances_val2014.json").write_text(json.dumps(ann))
    db = Coco("val", "2014", str(tmp_path))
    assert db.num_classes == 2
    all_boxes = [[[] for _ in range(2)] for _ in range(2)]
    # xyxy inclusive convention of the detection pipeline
    all_boxes[1][0] = np.array([[10, 10, 39, 39, 0.9]], np.float64)
    all_boxes[1][1] = np.array([[5, 5, 24, 24, 0.8]], np.float64)
    stats = db.evaluate_detections(all_boxes, str(tmp_path / "out"),
                                   log=None)
    assert stats["ap"] == pytest.approx(1.0)
    assert stats["ap50"] == pytest.approx(1.0)
    assert stats["per_class"]["dog"] == pytest.approx(1.0)
    assert osp.exists(stats["results_json"])
