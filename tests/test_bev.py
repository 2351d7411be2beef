"""BEV rasterization: jax version must bit-match the numpy reference twin."""

import numpy as np

from mv3d_tf_tpu.ops import bev


def _synthetic_scan(rng, n=5000):
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-5, 70, n)      # x: some out of range
    pts[:, 1] = rng.uniform(-35, 35, n)     # y: some out of range
    pts[:, 2] = rng.uniform(-2.5, 1.0, n)   # z: some out of range
    pts[:, 3] = rng.uniform(0, 1, n)        # reflectance
    return pts


def test_np_twin_tiny_hand_case():
    # one point at x=10, y=0, z=-1.0, r=0.5
    pts = np.array([[10.0, 0.0, -1.0, 0.5]], np.float32)
    top = bev.point_cloud_2_top_np(pts)
    assert top.shape == (601, 601, 9)
    # x_img = trunc(-0/0.1)+300 = 300; y_img = trunc(-10/0.1)+600 = 500
    # slice: z=-1.0 in [-1.1, -0.8) -> i=3 (starts -2,-1.7,-1.4,-1.1,...)
    assert top[500, 300, 3] == np.float32(pts[0, 2] + 2.0)
    assert top[500, 300, 8] == np.float32(0.5)
    assert np.count_nonzero(top) == 2


def test_last_write_wins_semantics():
    # two points in the same cell+slice: LAST in file order wins, not max
    pts = np.array([[10.0, 0.0, -0.9, 0.1],     # height value 1.1
                    [10.0, 0.0, -1.05, 0.9]],   # same slice [-1.1,-0.8), lower z
                   np.float32)
    top = bev.point_cloud_2_top_np(pts)
    assert top[500, 300, 3] == np.float32(pts[1, 2] + 2.0)   # last, not max
    assert top[500, 300, 8] == np.float32(0.9)
    # jax version matches
    p, v = bev.pad_points(pts, bucket=8)
    topj = np.asarray(bev.point_cloud_2_top(p, v))
    np.testing.assert_array_equal(topj, top)


def test_intensity_channel_cross_slice():
    # same cell, different slices: intensity winner is the LAST point of the
    # HIGHEST slice (reference rewrites ch8 every slice iteration)
    pts = np.array([[10.0, 0.0, 0.2, 0.7],     # slice 7 (z in [0.1, 0.4))
                    [10.0, 0.0, -1.9, 0.2]],   # slice 0
                   np.float32)
    top = bev.point_cloud_2_top_np(pts)
    assert top[500, 300, 8] == np.float32(0.7)
    assert top[500, 300, 0] == np.float32(pts[1, 2] + 2.0)
    assert top[500, 300, 7] == np.float32(pts[0, 2] + 2.0)
    p, v = bev.pad_points(pts, bucket=8)
    np.testing.assert_array_equal(np.asarray(bev.point_cloud_2_top(p, v)), top)


def test_jax_matches_np_random(rng):
    pts = _synthetic_scan(rng, 5000)
    top_np = bev.point_cloud_2_top_np(pts)
    p, v = bev.pad_points(pts, bucket=8192)
    top_j = np.asarray(bev.point_cloud_2_top(p, v))
    np.testing.assert_array_equal(top_j, top_np)


def test_strict_range_filters(rng):
    # boundary points excluded: x=0, x=60, y=-30, y=30 (strict inequalities)
    pts = np.array([[0.0, 0.0, -1.0, 0.5],
                    [60.0, 0.0, -1.0, 0.5],
                    [10.0, -30.0, -1.0, 0.5],
                    [10.0, 30.0, -1.0, 0.5],
                    [10.0, 0.0, -2.1, 0.5],    # below z range
                    [10.0, 0.0, 0.4, 0.5]],    # z == 0.4 excluded (< h+zres)
                   np.float32)
    top = bev.point_cloud_2_top_np(pts)
    assert np.count_nonzero(top) == 0
    p, v = bev.pad_points(pts, bucket=8)
    assert np.count_nonzero(np.asarray(bev.point_cloud_2_top(p, v))) == 0


def test_batch_vmap(rng):
    scans = [_synthetic_scan(rng, 3000) for _ in range(3)]
    padded = [bev.pad_points(s, 4096) for s in scans]
    pts = np.stack([p for p, _ in padded])
    val = np.stack([v for _, v in padded])
    tops = np.asarray(bev.point_cloud_2_top_batch(pts, val))
    assert tops.shape == (3, 601, 601, 9)
    for i, s in enumerate(scans):
        np.testing.assert_array_equal(tops[i], bev.point_cloud_2_top_np(s))


def test_pad_points_trim():
    pts = np.ones((10, 4), np.float32)
    p, v = bev.pad_points(pts, bucket=4)
    assert p.shape == (4, 4) and v.sum() == 4


def test_fast_path_bit_parity(rng):
    """Sort + Pallas placement (interpret) is bit-identical to both the
    numpy twin and the XLA scatter formulation, including duplicate-cell
    last-write-wins resolution."""
    import jax.numpy as jnp
    from mv3d_tf_tpu.ops.bev import (_point_cloud_2_top_batch_scatter,
                                     point_cloud_2_top_fast,
                                     point_cloud_2_top_np)

    N = 4096
    pts = np.zeros((2, N, 4), np.float32)
    pts[..., 0] = rng.rand(2, N) * 70 - 5
    pts[..., 1] = rng.rand(2, N) * 70 - 35
    pts[..., 2] = rng.rand(2, N) * 4 - 2.5
    pts[..., 3] = rng.rand(2, N)
    # force heavy duplicate-cell traffic
    pts[:, ::2, 0] = 10.0 + rng.rand(2, (N + 1) // 2) * 0.5
    pts[:, ::2, 1] = 5.0 + rng.rand(2, (N + 1) // 2) * 0.5
    val = rng.rand(2, N) > 0.05

    ref = np.stack([point_cloud_2_top_np(pts[b][val[b]]) for b in range(2)])
    fast = np.asarray(point_cloud_2_top_fast(
        jnp.asarray(pts), jnp.asarray(val), interpret=True))
    scat = np.asarray(_point_cloud_2_top_batch_scatter(
        jnp.asarray(pts), jnp.asarray(val)))
    assert np.array_equal(fast, ref)
    assert np.array_equal(scat, ref)
