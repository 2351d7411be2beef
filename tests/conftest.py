"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated with XLA's host-platform fake devices
(the driver separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).

CAUTION: the slow tier spawns subprocesses on the REAL TPU
(test_roi_pool_tpu re-exec, test_tools CLI drives) — the axon tunnel
serializes one client at a time and a collision can wedge the worker
(r5: a full-suite run degraded a concurrent training job's tunnel).
Never run `pytest tests/` while another TPU process is live; the
`-m "not slow"` tier is CPU-only and always safe.
"""

import os

# The environment pre-imports jax (site hook) with JAX_PLATFORMS=axon (the
# real TPU), so env vars alone are too late — update the live config before
# any backend initialization. Tests must run on 8 fake CPU devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the slow tier's big sharded programs
# compile once per machine, not once per pytest run (VERDICT weak #8).
from mv3d_tf_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
assert jax.devices()[0].platform == "cpu", "tests must run on fake CPU devices"
assert len(jax.devices()) == 8, "expected 8 fake CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # cfg.RNG_SEED parity
