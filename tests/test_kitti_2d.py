"""Legacy 2D KITTI imdb (reference lib/datasets/kitti.py surface)."""

import numpy as np


def _layout(tmp_path):
    root = tmp_path / "kitti2d"
    (root / "ImageSets").mkdir(parents=True)
    lbl = root / "object" / "training" / "label_2"
    img = root / "object" / "training" / "image_2"
    lbl.mkdir(parents=True)
    img.mkdir(parents=True)
    (root / "ImageSets" / "train.txt").write_text("000000\n000001\n")
    # frame 0: Car (kept), Van (remapped to Car), Pedestrian (kept),
    # truncated Car (filtered), tiny Cyclist (filtered: height <= 25)
    (lbl / "000000.txt").write_text(
        "Car 0.0 0 0.0 100 100 200 160 1.5 1.6 3.9 0 0 10 0.0\n"
        "Van 0.1 1 0.0 300 120 400 170 2.0 1.9 5.0 5 0 15 0.0\n"
        "Pedestrian 0.0 0 0.0 500 100 520 170 1.8 0.6 0.8 -5 0 12 0.0\n"
        "Car 0.6 0 0.0 600 100 700 160 1.5 1.6 3.9 8 0 20 0.0\n"
        "Cyclist 0.0 0 0.0 50 100 70 120 1.7 0.6 1.7 -8 0 18 0.0\n")
    (lbl / "000001.txt").write_text(
        "Cyclist 0.0 0 0.0 200 150 260 230 1.7 0.6 1.7 2 0 9 0.0\n")
    for idx in ("000000", "000001"):
        (img / (idx + ".png")).write_bytes(b"")
    return root


def test_load_filters_and_van_remap(tmp_path):
    from mv3d_tf_tpu.data.kitti_2d import Kitti2D
    imdb = Kitti2D("train", kitti_path=str(_layout(tmp_path)))
    imdb._roidb = [imdb._load_annotation(i) for i in imdb.image_index]
    e = imdb.roidb[0]
    # truncated Car and tiny Cyclist filtered out; Van became Car
    assert e["gt_classes"].tolist() == [1, 1, 2]
    assert imdb.roidb[1]["gt_classes"].tolist() == [3]
    assert imdb.classes == ("__background__", "Car", "Pedestrian", "Cyclist")


def test_results_writers_and_ap(tmp_path):
    from mv3d_tf_tpu.data.kitti_2d import Kitti2D
    imdb = Kitti2D("train", kitti_path=str(_layout(tmp_path)))
    imdb._roidb = [imdb._load_annotation(i) for i in imdb.image_index]

    # perfect detections == gt per class
    all_boxes = [[[] for _ in range(2)] for _ in range(4)]
    for i in range(2):
        e = imdb.roidb[i]
        for c in (1, 2, 3):
            m = e["gt_classes"] == c
            g = e["boxes"][m]
            sc = np.full((len(g), 1), 0.9, np.float32)
            all_boxes[c][i] = np.hstack([g, sc]) if len(g) else \
                np.zeros((0, 5), np.float32)
    out = tmp_path / "results"
    table = imdb.evaluate_detections(all_boxes, str(out))
    assert (out / "000000.txt").exists()
    assert (out / "detections.txt").exists()
    # each line ends with the score, alpha written as -10 (kitti.py:664)
    line = (out / "000000.txt").read_text().splitlines()[0].split()
    assert line[3] == "-10.000000"
    for cls in ("Car", "Pedestrian", "Cyclist"):
        assert table[cls]["hard"] == 1.0, (cls, table)


def test_factory_dispatch(tmp_path):
    from mv3d_tf_tpu.data import kitti as K
    from mv3d_tf_tpu.data.kitti_2d import Kitti2D
    root = _layout(tmp_path)
    K._IMDB_FACTORY.clear()
    try:
        imdb = K.get_imdb("kitti2d_train", kitti_path=str(root))
        assert isinstance(imdb, Kitti2D)
    finally:
        K._IMDB_FACTORY.clear()
