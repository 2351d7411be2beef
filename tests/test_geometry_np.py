"""Numpy geometry twins (geometry_np.py) vs the jnp originals."""

import numpy as np

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu import geometry_np as Gnp


def test_host_twins_match_jnp():
    rng = np.random.RandomState(0)
    for _ in range(20):
        box = np.array([rng.uniform(-20, 20), rng.uniform(-1, 3),
                        rng.uniform(5, 60), rng.uniform(3, 5),
                        rng.uniform(1.4, 2), rng.uniform(1.3, 1.8)],
                       np.float32)
        ry = np.float32(rng.uniform(-np.pi, np.pi))
        Tr = np.eye(3, 4, dtype=np.float32)
        Tr[:, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                             np.float32)
        Tr[:, 3] = rng.randn(3).astype(np.float32) * 0.1

        cam = Gnp.compute_corners_3d_np(box, ry)
        cam_j = np.asarray(G.compute_corners_3d(box, ry))
        np.testing.assert_allclose(cam, cam_j, rtol=1e-6, atol=1e-5)

        lid = Gnp.camera_to_lidar_cnr_np(cam, Tr)
        lid_j = np.asarray(G.camera_to_lidar_cnr(cam_j, Tr))
        np.testing.assert_allclose(lid, lid_j, rtol=1e-5, atol=1e-4)

        lwh = box[3:6][None]
        b3 = Gnp.lidar_cnr_to_3d_np(lid, lwh)
        b3_j = np.asarray(G.lidar_cnr_to_3d(lid_j, lwh))
        np.testing.assert_allclose(b3, b3_j, rtol=1e-5, atol=1e-4)

        bv = Gnp.lidar_3d_to_bv_np(b3[:, :6])
        bv_j = np.asarray(G.lidar_3d_to_bv(b3_j[:, :6]))
        # floor() can flip one pixel on an exact cell boundary; random
        # continuous inputs never sit on one
        np.testing.assert_array_equal(bv, bv_j)


def test_bv_anchor_twin():
    rng = np.random.RandomState(1)
    anchors = rng.randint(0, 600, (50, 4)).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    got = Gnp.bv_anchor_to_lidar_np(anchors)
    ref = np.asarray(G.bv_anchor_to_lidar(anchors))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
