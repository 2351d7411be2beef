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


@pytest.mark.slow
def test_parallel_detect_matches_single():
    """build_parallel_detect over the 8-CPU mesh == the single-device
    detector per frame (VERDICT r1 #5b)."""
    from mv3d_tf_tpu.eval import build_detect_fn
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.parallel.mesh import build_parallel_detect, replicate

    mesh = make_mesh()
    params = mv3d.init_params(jax.random.PRNGKey(2))
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=10)
    rng = np.random.RandomState(5)
    B = 8
    bev = rng.rand(B, 81, 81, 9).astype(np.float32)
    image = (rng.rand(B, 88, 120, 3) * 255).astype(np.float32)
    calib = np.tile(graft._example_calib()[None], (B, 1, 1))

    pdetect = build_parallel_detect(mesh, **kwargs)
    det = pdetect(replicate(mesh, params),
                  *shard_batch(mesh, {"b": bev, "i": image,
                                      "c": calib}).values())
    single = build_detect_fn(**kwargs)
    for b in (0, 3, 7):
        one = single(params, bev[b], image[b], calib[b])
        for k in ("scores", "boxes_bv", "boxes_cnr_r", "valid"):
            np.testing.assert_allclose(
                np.asarray(det[k][b], np.float32),
                np.asarray(one[k], np.float32), rtol=1e-5, atol=1e-5,
                err_msg="frame {} key {}".format(b, k))


@pytest.mark.slow
def test_spatial_detect_matches_single():
    """build_spatial_detect (rows of ONE frame split across the 8-CPU
    mesh, XLA-inserted conv halo exchanges) == the single-device
    detector (SURVEY 2.8 spatial-sharding item)."""
    from mv3d_tf_tpu.eval import build_detect_fn
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.parallel.mesh import build_spatial_detect, replicate

    mesh = make_mesh()
    params = mv3d.init_params(jax.random.PRNGKey(2))
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=50,
                  post_nms_top_n=10)
    rng = np.random.RandomState(6)
    bev = rng.rand(81, 81, 9).astype(np.float32)   # 81 rows: uneven/8
    image = (rng.rand(88, 120, 3) * 255).astype(np.float32)
    calib = graft._example_calib()

    sdetect = build_spatial_detect(mesh, **kwargs)
    det = sdetect(replicate(mesh, params), bev, image, calib)
    one = build_detect_fn(**kwargs)(params, bev, image, calib)
    for k in ("scores", "boxes_bv", "boxes_cnr_r", "valid"):
        np.testing.assert_allclose(
            np.asarray(det[k], np.float32),
            np.asarray(one[k], np.float32), rtol=1e-5, atol=1e-5,
            err_msg=k)
