"""Multi-chip (virtual 8-CPU mesh) data parallelism tests."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from mv3d_tf_tpu.parallel.mesh import make_mesh, shard_batch


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_shard_batch_placement():
    mesh = make_mesh()
    batch = {"x": np.zeros((8, 4, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4, 4)


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_eval_shape():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out["scores"].shape == (300, 2)
    assert out["boxes_cnr"].shape == (300, 48)
