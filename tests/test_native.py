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
