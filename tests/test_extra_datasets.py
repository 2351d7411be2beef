"""kitti_tracking, coco (stdlib json), nissan/nthu image lists, pascal3d."""

import json
import os.path as osp

import numpy as np
import pytest

from mv3d_tf_tpu.data.extra_datasets import (Coco, ImageListDataset,
                                             KittiTracking, PASCAL3D_CLASSES)


def _png(path, hw=(40, 60)):
    from PIL import Image
    Image.new("RGB", (hw[1], hw[0])).save(path)


def test_kitti_tracking(tmp_path):
    seq = "0001"
    d = tmp_path / "training"
    (d / "image_02" / seq).mkdir(parents=True)
    (d / "label_02").mkdir()
    for fr in ("000000", "000001"):
        _png(d / "image_02" / seq / (fr + ".png"))
    (d / "label_02" / (seq + ".txt")).write_text(
        "0 1 Car 0 0 -1.5 100 110 200 180 1.5 1.6 4.0 2.0 1.5 15.0 0.3\n"
        "0 2 Pedestrian 0 0 0 5 5 10 10 1.8 0.6 0.6 1 1 8 0\n"
        "1 1 Car 0 0 -1.4 105 110 205 180 1.5 1.6 4.0 2.2 1.5 14.5 0.25\n")
    db = KittiTracking("train", seq, str(tmp_path))
    assert db.num_images == 2
    e0 = db.roidb[0]
    # reference class set keeps Car+Pedestrian+Cyclist (kitti_tracking.py:26)
    np.testing.assert_array_equal(e0["gt_classes"], [1, 2])
    np.testing.assert_allclose(e0["boxes"][0], [100, 110, 200, 180])
    np.testing.assert_allclose(e0["boxes_3D_cam"][0],
                               [2.0, 1.5, 15.0, 4.0, 1.6, 1.5])
    assert db.roidb[1]["ry"][0] == pytest.approx(0.25)


def test_coco_stdlib_json(tmp_path):
    ann = {
        "images": [{"id": 7, "file_name": "7.jpg", "width": 60,
                    "height": 40}],
        "annotations": [{"image_id": 7, "category_id": 3,
                         "bbox": [10, 10, 20, 15], "iscrowd": 0},
                        {"image_id": 7, "category_id": 3,
                         "bbox": [0, 0, 5, 5], "iscrowd": 1}],
        "categories": [{"id": 3, "name": "car"}, {"id": 9, "name": "dog"}],
    }
    (tmp_path / "annotations").mkdir()
    (tmp_path / "images").mkdir()
    with open(tmp_path / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ann, f)
    _png(tmp_path / "images" / "7.jpg")
    db = Coco("val", "2017", str(tmp_path))
    assert db.classes == ("__background__", "car", "dog")
    e = db.roidb[0]
    assert len(e["gt_classes"]) == 1            # crowd filtered
    np.testing.assert_allclose(e["boxes"][0], [10, 10, 29, 24])
    # results writer (val split: returns AP stats, json still written)
    all_boxes = [[[]], [np.array([[10, 10, 29, 24, 0.9]])], [[]]]
    stats = db.evaluate_detections(all_boxes, str(tmp_path / "out"))
    assert stats["ap"] == pytest.approx(1.0)
    res = json.load(open(tmp_path / "out" /
                         "detections_val2017_results.json"))
    assert res[0]["category_id"] == 3
    assert res[0]["bbox"] == [10.0, 10.0, 20.0, 15.0]


def test_image_list_dataset(tmp_path):
    for n in ("a", "b"):
        _png(tmp_path / (n + ".jpg"))
    db = ImageListDataset("nissan", str(tmp_path))
    assert db.num_images == 2
    assert db.roidb[0]["boxes"].shape == (0, 4)
    all_boxes = [[[], []], [np.array([[1, 2, 3, 4, 0.5]]), []]]
    path = db.evaluate_detections(all_boxes, str(tmp_path / "out"))
    assert "a Car" in open(path).read()


def test_factory_extra_names(tmp_path):
    from mv3d_tf_tpu.data.kitti import get_imdb
    assert len(PASCAL3D_CLASSES) == 13
    for n in ("a",):
        _png(tmp_path / (n + ".jpg"))
    db = get_imdb("nthu", kitti_path=str(tmp_path))
    assert db.name == "nthu"
