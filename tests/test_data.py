"""Data pipeline: synthetic KITTI fixture -> imdb -> loader -> batch."""

import numpy as np
import pytest

from mv3d_tf_tpu.data import synthetic
from mv3d_tf_tpu.data.kitti import KittiMV3D, get_imdb, prepare_roidb
from mv3d_tf_tpu.data.loader import RoIDataLayer, get_minibatch, pad_gt


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    synthetic.generate(str(root), num_frames=4, cars_per_frame=3, seed=0)
    return str(root)


@pytest.fixture(scope="module")
def imdb(kitti_root):
    db = KittiMV3D("train", kitti_path=kitti_root)
    prepare_roidb(db)
    return db


def test_imdb_identity(imdb):
    assert imdb.classes == ("__background__", "Car")
    assert imdb.num_images == 2          # half of 4 frames in train split


def test_calib_blob(imdb):
    calib = imdb.calib_at(0)
    assert calib.shape == (4, 12)
    np.testing.assert_allclose(calib[0].reshape(3, 4), synthetic.P2)
    np.testing.assert_allclose(calib[2, :9].reshape(3, 3), synthetic.R0)


def test_annotations_geometry(imdb):
    entry = imdb.roidb[0]
    n = len(entry["gt_classes"])
    assert n == 3
    assert (entry["gt_classes"] == 1).all()
    # all derived blobs consistent shapes
    assert entry["boxes_bv"].shape == (n, 4)
    assert entry["boxes_corners"].shape == (n, 24)
    # BEV boxes inside the raster
    assert entry["boxes_bv"].min() > -50 and entry["boxes_bv"].max() < 650
    # lidar box center == mean of lidar corners (definition)
    c = entry["boxes_corners"].reshape(n, 3, 8)
    np.testing.assert_allclose(entry["boxes_3D"][:, :3], c.mean(2), atol=1e-4)


def test_bev_raster_contains_car_points(imdb):
    """Velodyne points sampled on cars must rasterize inside the gt BEV box."""
    entry = imdb.roidb[0]
    bev = np.load(entry["lidar_bv_path"])
    assert bev.shape == (601, 601, 9)
    occupancy = (bev[:, :, :8] > 0).any(axis=2)
    for b in entry["boxes_bv"]:
        x1, y1, x2, y2 = b.astype(int)
        x1, x2 = sorted((x1, x2))
        y1, y2 = sorted((y1, y2))
        sub = occupancy[max(y1 - 2, 0):y2 + 3, max(x1 - 2, 0):x2 + 3]
        assert sub.any(), f"no BEV points inside gt box {b}"


def test_minibatch_shapes(imdb):
    batch = get_minibatch(imdb.roidb[0])
    assert batch["bev"].shape == (601, 601, 9)
    assert batch["image"].shape == (384, 1248, 3)
    assert batch["calib"].shape == (4, 12)
    assert batch["gt_boxes_bv"].shape[1] == 5
    assert batch["gt_boxes_3d"].shape[1] == 7
    assert batch["gt_boxes_corners"].shape[1] == 25
    assert batch["gt_valid"].sum() == 3
    # padded gt rows keep nonzero sizes (log-safety)
    assert (batch["gt_boxes_3d"][batch["gt_valid"] == False][:, 3:6] == 1).all()  # noqa: E712


def test_loader_epoch_cycling(imdb):
    layer = RoIDataLayer(imdb.roidb, prefetch=0, seed=0)
    seen = [layer.forward()["calib"][0, 3] for _ in range(4)]
    assert len(seen) == 4    # cycles past one epoch without error


def test_loader_prefetch_thread(imdb):
    layer = RoIDataLayer(imdb.roidb, prefetch=2, seed=0)
    b = layer.forward()
    assert b["bev"].shape == (601, 601, 9)


def test_imdb_factory(kitti_root):
    db = get_imdb("kitti_val", kitti_path=kitti_root)
    assert db.name == "kitti_val"
    with pytest.raises(KeyError):
        get_imdb("cityscapes_train")


def test_evaluate_detections_writes_files(imdb, tmp_path):
    from mv3d_tf_tpu.config import cfg
    old_root = cfg.ROOT_DIR
    cfg.ROOT_DIR = str(tmp_path)
    try:
        n = imdb.num_images
        dets = np.array([[10, 10, 50, 50, 0.9]], np.float32)
        dets3d = np.array([np.arange(25, dtype=np.float32)])
        all_boxes = [[[] for _ in range(n)], [dets for _ in range(n)]]
        all_boxes3d = [[[] for _ in range(n)], [dets3d for _ in range(n)]]
        path = imdb.evaluate_detections(all_boxes, all_boxes3d)
        import os
        files = os.listdir(path)
        assert len(files) == n
        content = open(os.path.join(path, files[0])).read()
        assert content.startswith("car")
    finally:
        cfg.ROOT_DIR = old_root


def test_get_imdb_dispatch_order(tmp_path):
    """Every registered name pattern resolves to the right class — in
    particular kitti_tracking_* must NOT fall into the generic kitti_
    branch (round-1 bug: unreachable branch ordering)."""
    from mv3d_tf_tpu.data import kitti as K
    from mv3d_tf_tpu.data.extra_datasets import KittiTracking

    # build a minimal tracking layout
    root = tmp_path / "tracking"
    seq_dir = root / "training" / "image_02" / "0001"
    seq_dir.mkdir(parents=True)
    (seq_dir / "000000.png").write_bytes(b"")
    K._IMDB_FACTORY.clear()
    try:
        imdb = K.get_imdb("kitti_tracking_train_0001", kitti_path=str(root))
        assert isinstance(imdb, KittiTracking)
    finally:
        K._IMDB_FACTORY.clear()


def test_prefetch_worker_error_propagates():
    """A poisoned roidb entry raises in forward() instead of hanging."""
    import pytest
    from mv3d_tf_tpu.data.loader import RoIDataLayer

    bad = [{"image_path": "/nonexistent/definitely_missing.png",
            "lidar_bv_path": "/nonexistent/missing.npy",
            "calib": np.zeros((4, 12), np.float32),
            "gt_classes": np.array([1]),
            "boxes": np.zeros((1, 4), np.float32),
            "boxes_bv": np.zeros((1, 4), np.float32),
            "boxes_3D": np.zeros((1, 6), np.float32),
            "boxes_corners": np.zeros((1, 24), np.float32)}]
    layer = RoIDataLayer(bad, prefetch=1)
    with pytest.raises(RuntimeError, match="prefetch worker died"):
        layer.forward()


def test_box_points_follow_yaw():
    """The car's lidar points must lie on the YAWED box (not its
    axis-aligned bounding volume): yaw has to be observable in the data
    for the corner-regression stage to be learnable (the pre-r3 generator
    sampled the aabb — quality-mode AP was provably stuck at 0)."""
    rng = np.random.RandomState(0)
    cam_box = np.array([0.0, 1.65, 20.0, 4.2, 1.6, 1.5], np.float32)
    ry = np.pi / 4
    pts = synthetic._sample_box_points(rng, cam_box, ry, n=4000)
    from mv3d_tf_tpu import geometry_np as Gnp
    cam_cnr = Gnp.compute_corners_3d_np(cam_box, ry)
    lidar_cnr = Gnp.camera_to_lidar_cnr_np(cam_cnr, synthetic.TR_VELO2CAM)
    c = lidar_cnr.reshape(3, 8)
    ctr = c.mean(1)
    # footprint PCA axis must align with the yawed box's long axis
    xy = pts[:, :2] - ctr[:2]
    cov = xy.T @ xy / len(xy)
    evec = np.linalg.eigh(cov)[1][:, -1]
    long_axis = c[:2, 0] - c[:2, 3]          # corner0 - corner3 = length dir
    long_axis /= np.linalg.norm(long_axis)
    assert abs(float(evec @ long_axis)) > 0.95
    # and points must NOT fill the aabb: the aabb corner regions outside
    # the yawed footprint stay (near) empty
    lo, hi = c.min(1), c.max(1)
    corner_lo = ((pts[:, 0] < lo[0] + 0.5) & (pts[:, 1] < lo[1] + 0.5))
    assert corner_lo.mean() < 0.005


def test_box_points_heading_asymmetry():
    """Front (hood, low) vs rear (cabin, tall) must differ in max height —
    the cue that disambiguates yaw from yaw+pi for the corner regressor."""
    rng = np.random.RandomState(1)
    cam_box = np.array([0.0, 1.65, 20.0, 4.2, 1.6, 1.5], np.float32)
    pts = synthetic._sample_box_points(rng, cam_box, 0.0, n=4000)
    # ry=0: camera +x (car forward) == lidar -y (TR_VELO2CAM)
    front = pts[pts[:, 1] < -0.8]
    rear = pts[pts[:, 1] > 0.8]
    assert front[:, 2].max() < rear[:, 2].max() - 0.3


def test_images_contain_car_patches(kitti_root):
    """The image view must carry car signal (the pre-r3 generator wrote
    pure noise): pixels inside a projected gt box differ from the noise
    background's 90..150 range."""
    from PIL import Image
    db = KittiMV3D("train", kitti_path=kitti_root)
    entry = db.roidb[0]
    im = np.asarray(Image.open(db.image_path_at(0)), np.float32)
    x1, y1, x2, y2 = entry["boxes"][0].astype(int)
    patch = im[max(y1, 0):y2, max(x1, 0):x2]
    assert patch.size > 0
    # the painted body/front fills are outside the 90..150 noise band
    assert (patch < 85).mean() + (patch > 155).mean() > 0.3
