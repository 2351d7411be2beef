"""Native C++ loader vs the numpy path."""

import numpy as np
import pytest

from mv3d_tf_tpu.ops.bev import load_velodyne, pad_points
from mv3d_tf_tpu.utils import native


@pytest.fixture
def scans(tmp_path, rng):
    paths = []
    for i, n in enumerate((777, 2000, 50)):
        scan = rng.randn(n, 4).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        scan.tofile(p)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ toolchain expected in image"


def test_single_matches_numpy(scans):
    for p in scans:
        out, valid = native.load_velodyne_padded(p, bucket=1024)
        exp_out, exp_valid = pad_points(load_velodyne(p), 1024)
        np.testing.assert_array_equal(out, exp_out)
        np.testing.assert_array_equal(valid, exp_valid)


def test_batch_matches_numpy(scans):
    out, valid = native.load_velodyne_batch(scans, bucket=1024, n_threads=3)
    for i, p in enumerate(scans):
        exp_out, exp_valid = pad_points(load_velodyne(p), 1024)
        np.testing.assert_array_equal(out[i], exp_out)
        np.testing.assert_array_equal(valid[i], exp_valid)


def test_truncation_beyond_bucket(scans):
    out, valid = native.load_velodyne_padded(scans[1], bucket=100)
    assert valid.sum() == 100
    exp = load_velodyne(scans[1])[:100]
    np.testing.assert_array_equal(out, exp)


def test_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        native.load_velodyne_padded(str(tmp_path / "nope.bin"), bucket=16)


def test_bev_raster_native_bit_parity():
    """native/bev_raster.cc == point_cloud_2_top_np bit-for-bit,
    including boundary coordinates and last-write-wins duplicates."""
    from mv3d_tf_tpu.ops.bev import point_cloud_2_top_np
    from mv3d_tf_tpu.utils.native import (get_bev_lib,
                                          point_cloud_2_top_host)
    if get_bev_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(5)
    n = 40000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.rand(n) * 80 - 10
    pts[:, 1] = rng.rand(n) * 80 - 40
    pts[:, 2] = rng.rand(n) * 4 - 3
    pts[:, 3] = rng.rand(n)
    # exact cell-boundary coords + duplicate cells (winner rules)
    pts[0] = [10.0, -17.3, -1.0, 0.5]
    pts[1] = [10.0, -17.3, -1.0, 0.7]
    pts[2] = [0.05, 29.95, 0.39, 0.9]
    ref = point_cloud_2_top_np(pts)
    got = point_cloud_2_top_host(pts)
    assert got.shape == ref.shape
    assert (got == ref).all(), np.abs(got - ref).max()


def test_bev_raster_files_native(tmp_path):
    """Threaded file rasterization == per-file numpy twin."""
    from mv3d_tf_tpu.ops.bev import point_cloud_2_top_np
    from mv3d_tf_tpu.utils.native import bev_raster_files, get_bev_lib
    if get_bev_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(6)
    paths, refs = [], []
    for i in range(5):
        n = rng.randint(100, 3000)
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.rand(n) * 70 - 5
        pts[:, 1] = rng.rand(n) * 70 - 35
        pts[:, 2] = rng.rand(n) * 4 - 3
        pts[:, 3] = rng.rand(n)
        p = str(tmp_path / "{:06d}.bin".format(i))
        pts.tofile(p)
        paths.append(p)
        refs.append(point_cloud_2_top_np(pts))
    got = bev_raster_files(paths, n_threads=3)
    assert (got == np.stack(refs)).all()
