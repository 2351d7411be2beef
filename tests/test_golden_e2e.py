"""Golden end-to-end regression canary.

A fixed-seed synthetic frame through the full detector must keep
producing the same boxes/scores (CPU, f32) — any semantic drift in
geometry, proposals, pooling, or the heads trips this test. The golden
values are regenerated intentionally with REGEN=1 python -m pytest ...
"""

import os

import jax
import numpy as np
import pytest

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "golden_e2e.npz")


def _detect_once():
    from mv3d_tf_tpu.eval import build_detect_fn
    from mv3d_tf_tpu.models import mv3d
    rng = np.random.RandomState(7)
    params = mv3d.init_params(jax.random.PRNGKey(7))
    detect = build_detect_fn(feat_h=10, feat_w=10, pre_nms_top_n=120,
                             post_nms_top_n=40)
    bev = rng.rand(81, 81, 9).astype(np.float32)
    img = (rng.rand(88, 120, 3) * 255).astype(np.float32)
    calib = np.zeros((4, 12), np.float32)
    calib[0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                0, 0, 1.0, 0.005]
    calib[1] = calib[0]
    calib[2, :9] = np.eye(3).reshape(-1)
    calib[3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    det = detect(params, bev, img, calib)
    return {k: np.asarray(v) for k, v in det.items()}


@pytest.mark.slow
def test_golden_end_to_end():
    det = _detect_once()
    if os.environ.get("REGEN") == "1" or not os.path.exists(GOLDEN_FILE):
        np.savez(GOLDEN_FILE, scores=det["scores"],
                 boxes_bv=det["boxes_bv"], boxes_cnr_r=det["boxes_cnr_r"],
                 valid=det["valid"])
        pytest.skip("golden file (re)generated")
    g = np.load(GOLDEN_FILE)
    np.testing.assert_array_equal(det["valid"], g["valid"])
    np.testing.assert_allclose(det["scores"], g["scores"], atol=1e-4)
    np.testing.assert_allclose(det["boxes_bv"], g["boxes_bv"], atol=1e-2)
    np.testing.assert_allclose(det["boxes_cnr_r"], g["boxes_cnr_r"],
                               atol=1e-2)
