"""Legacy 2D solver loops end-to-end on a synthetic VOC dataset."""

import numpy as np
import pytest

from mv3d_tf_tpu.data.blob import im_list_to_blob, prep_im_for_blob


def test_prep_im_for_blob_scaling():
    im = np.full((300, 500, 3), 100.0, np.float32)
    out, scale = prep_im_for_blob(im, np.zeros((1, 1, 3)), 600, 1000)
    # short side 300 -> x2 would make long side 1000 -> capped at 1000
    assert scale == pytest.approx(2.0)
    assert out.shape == (600, 1000, 3)
    im2 = np.zeros((300, 600, 3), np.float32)
    out2, scale2 = prep_im_for_blob(im2, np.zeros((1, 1, 3)), 600, 1000)
    assert scale2 == pytest.approx(1000.0 / 600.0)   # long-side cap


def test_im_list_to_blob():
    blob = im_list_to_blob([np.ones((10, 20, 3)), np.ones((15, 12, 3))])
    assert blob.shape == (2, 15, 20, 3)
    assert blob[0, :10, :20].sum() == 10 * 20 * 3
    assert blob[0, 10:].sum() == 0


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    from PIL import Image
    rng = np.random.RandomState(0)
    base = tmp_path_factory.mktemp("vocdk")
    d = base / "VOC2007"
    (d / "ImageSets" / "Main").mkdir(parents=True)
    (d / "Annotations").mkdir()
    (d / "JPEGImages").mkdir()
    ids = ["000001", "000002"]
    (d / "ImageSets" / "Main" / "train.txt").write_text("\n".join(ids))
    for idx in ids:
        (d / "Annotations" / (idx + ".xml")).write_text("""
<annotation><object><name>car</name><difficult>0</difficult>
<bndbox><xmin>31</xmin><ymin>41</ymin><xmax>121</xmax><ymax>101</ymax></bndbox>
</object></annotation>""")
        Image.fromarray((rng.rand(180, 240, 3) * 255).astype(np.uint8)).save(
            d / "JPEGImages" / (idx + ".jpg"))
    return str(base)


@pytest.mark.slow
def test_train_and_test_2d_end_to_end(voc_root, tmp_path, monkeypatch):
    from mv3d_tf_tpu.config import cfg
    from mv3d_tf_tpu.data.kitti import get_imdb
    from mv3d_tf_tpu.solver import test_net_2d, train_net_2d
    monkeypatch.setattr(cfg, "ROOT_DIR", str(tmp_path))
    monkeypatch.setattr(cfg, "DATA_DIR", str(tmp_path / "data"))
    monkeypatch.setattr(cfg.TRAIN, "DISPLAY", 1)
    monkeypatch.setattr(cfg.TRAIN, "SNAPSHOT_ITERS", 2)
    monkeypatch.setattr(cfg.TRAIN, "SCALES", (96,))
    monkeypatch.setattr(cfg.TRAIN, "MAX_SIZE", 160)
    monkeypatch.setattr(cfg.TEST, "SCALES", (96,))
    monkeypatch.setattr(cfg.TEST, "MAX_SIZE", 160)
    monkeypatch.setattr(cfg.TRAIN, "RPN_PRE_NMS_TOP_N", 60)
    monkeypatch.setattr(cfg.TRAIN, "RPN_POST_NMS_TOP_N", 12)
    monkeypatch.setattr(cfg.TEST, "RPN_PRE_NMS_TOP_N", 60)
    monkeypatch.setattr(cfg.TEST, "RPN_POST_NMS_TOP_N", 12)
    monkeypatch.setattr(cfg.TRAIN, "BATCH_SIZE", 8)
    # end-to-end RPN training needs HAS_RPN, like the reference's
    # faster_rcnn_end2end.yml (the config default False means Fast R-CNN
    # over precomputed proposals — solver.train_net_fast_rcnn)
    monkeypatch.setattr(cfg.TRAIN, "HAS_RPN", True)

    imdb = get_imdb("voc_2007_train", devkit_path=voc_root)
    roidb = imdb.roidb
    for i, entry in enumerate(roidb):
        entry.setdefault("image_path", imdb.image_path_at(i))
    out_dir = str(tmp_path / "out")
    import os
    os.makedirs(out_dir, exist_ok=True)
    logs = []
    params = train_net_2d(imdb, roidb, out_dir, max_iters=2,
                          bucket_hw=(96, 160), log=logs.append)
    assert any("total loss" in l for l in logs)
    aps = test_net_2d(params, imdb, bucket_hw=(96, 160), thresh=0.0,
                      log=logs.append)
    assert "car" in aps
