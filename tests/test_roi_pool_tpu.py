"""Real-TPU (non-interpret) parity for the Pallas ROI-pool kernel.

The suite's conftest forces the fake-CPU platform, so this test re-execs
the check in a clean subprocess that keeps the environment's default
(real TPU) backend. Exercises right-edge ROIs specifically — the case
where the aligned column-window clamp (W_pad - WIN) must hold the Mosaic
sublane alignment promise (see roi_pool_pallas.py).
"""

import os
import subprocess
import sys

import pytest

_CHECK = r"""
import jax, numpy as np
from mv3d_tf_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
if jax.devices()[0].platform == "cpu":
    print("NO_TPU")
    raise SystemExit(0)
from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
from mv3d_tf_tpu.ops.roi_pool import roi_pool_np

rng = np.random.RandomState(0)
for (H, W, C, max_w) in [(75, 75, 512, 605), (48, 156, 512, 1352)]:
    feat = rng.rand(2, H, W, C).astype(np.float32)
    R = 64
    x2 = np.full(R, (W - 1) * 8.0)
    x1 = (x2 - rng.randint(8, max_w - 8, R)).clip(0)
    y1 = rng.randint(0, H * 4, R) * 2.0
    y2 = (y1 + rng.randint(8, H * 8 - 1, R)).clip(0, H * 8 - 1)
    rois = np.stack([rng.randint(0, 2, R).astype(np.float32),
                     x1, y1, x2, y2], 1).astype(np.float32)
    out = np.asarray(roi_pool_pallas(jax.device_put(feat),
                                     jax.device_put(rois),
                                     max_in_h=H * 8, max_in_w=max_w))
    ref = np.stack([roi_pool_np(feat[int(r[0])], r[None])[0] for r in rois])
    assert np.abs(out - ref).max() == 0.0, (H, W)
print("TPU_PARITY_OK")
"""


@pytest.mark.slow
def test_roi_pool_pallas_real_tpu_right_edge():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHECK],
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            env=env, capture_output=True, text=True, timeout=600)
    except subprocess.TimeoutExpired:
        # a dead/wedged device tunnel hangs the axon backend at init —
        # that is an environment outage, not a kernel parity failure
        pytest.skip("TPU tunnel unreachable (device init timed out)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    if "NO_TPU" in proc.stdout:
        pytest.skip("no real TPU in this environment")
    assert "TPU_PARITY_OK" in proc.stdout, proc.stdout + proc.stderr[-2000:]
