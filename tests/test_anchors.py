"""Tests for anchors.py — golden values derived from the reference formulas."""

import numpy as np

from mv3d_tf_tpu import anchors as A


def test_generate_anchors_bv_golden():
    a = A.generate_anchors_bv()
    # IEEE: int(3.9/0.1)=39, int(1.6/0.1)=16, int(1.0/0.1)=10, int(0.6/0.1)=5
    exp = np.array([
        [-19, -8, 20, 8],    # car: 39x16 cells
        [-5, -2, 5, 3],      # small: 10x5 cells
        [-8, -19, 8, 20],    # car rotated (cols [1,0,3,2])
        [-2, -5, 3, 5],      # small rotated
    ])
    np.testing.assert_array_equal(a, exp)


def test_generate_anchors_2d_golden():
    # golden values: the canonical py-faster-rcnn output (the 0-based
    # variant of the MATLAB table quoted in generate_anchors.py:10-35)
    a = A.generate_anchors()
    exp = np.array([
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ])
    np.testing.assert_allclose(a, exp)


def test_shift_grid_order():
    base = A.generate_anchors_bv()
    grid = A.shift_anchors(base, height=3, width=2, feat_stride=8)
    assert grid.shape == (3 * 2 * 4, 4)
    # location-major: first 4 rows are the base anchors at shift (0,0)
    np.testing.assert_allclose(grid[:4], base)
    # next 4 at shift x=8 (row-major meshgrid: x varies fastest)
    np.testing.assert_allclose(grid[4:8], base + np.array([8, 0, 8, 0]))
    # location index 2 is (x=0, y=8)
    np.testing.assert_allclose(grid[8:12], base + np.array([0, 8, 0, 8]))


def test_anchor_grid_75():
    g = A.get_anchor_grid(75, 75)
    assert g.total == 75 * 75 * 4
    assert g.anchors_3d.shape == (g.total, 6)
    # all 3D anchors share the fixed z/height lift
    np.testing.assert_allclose(g.anchors_3d[:, 2], -(1.73 - 0.78), atol=1e-5)
    np.testing.assert_allclose(g.anchors_3d[:, 5], 1.56, atol=1e-5)
    # inside mask: strictly inside 601x601
    inside = g.anchors_bv[g.inside]
    assert inside.shape[0] > 0
    assert inside[:, 0].min() >= 0 and inside[:, 2].max() < 601
    outside = g.anchors_bv[~g.inside]
    assert ((outside[:, 0] < 0) | (outside[:, 1] < 0)
            | (outside[:, 2] >= 601) | (outside[:, 3] >= 601)).all()


def test_anchor_grid_cache():
    assert A.get_anchor_grid(75, 75) is A.get_anchor_grid(75, 75)
