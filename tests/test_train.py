"""One full train step end-to-end on a tiny spatial config."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.anchors import get_anchor_grid
from mv3d_tf_tpu.models import mv3d
from mv3d_tf_tpu.train import build_train_step, compute_losses, smooth_l1

MAX_GT = 8


def _batch(rng):
    grid = get_anchor_grid(10, 10)
    inside_idx = np.where(grid.inside)[0]
    gt_bv = np.zeros((MAX_GT, 5), np.float32)
    gt_valid = np.zeros(MAX_GT, bool)
    gt_3d = np.zeros((MAX_GT, 7), np.float32)
    gt_3d[:, 3:6] = 1.0
    gt_cnr = np.zeros((MAX_GT, 25), np.float32)
    for i, a in enumerate([40, 200]):
        gt_bv[i, :4] = grid.anchors_bv[inside_idx[a]]
        gt_bv[i, 4] = 1.0
        gt_valid[i] = True
        gt_3d[i, :6] = np.asarray(
            G.bv_anchor_to_lidar(gt_bv[i:i + 1, :4]))[0]
        gt_3d[i, 6] = 1.0
        gt_cnr[i, :24] = np.asarray(G.lidar_3d_to_corners(gt_3d[i:i + 1, :6]))[0]
        gt_cnr[i, 24] = 1.0
    calib = np.zeros((4, 12), np.float32)
    calib[0] = [700, 0, 600, 0, 0, 700, 180, 0, 0, 0, 1, 0]
    calib[2, :9] = np.eye(3).reshape(-1)
    calib[3] = [0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0]
    return {
        "bev": rng.rand(81, 81, 9).astype(np.float32),
        "image": (rng.rand(88, 120, 3) * 255).astype(np.float32),
        "calib": calib,
        "gt_boxes_bv": gt_bv,
        "gt_boxes_3d": gt_3d,
        "gt_boxes_corners": gt_cnr,
        "gt_valid": gt_valid,
    }


def test_smooth_l1_matches_formula():
    x = np.linspace(-2, 2, 101).astype(np.float32)
    y = np.asarray(smooth_l1(jnp.asarray(x), sigma=3.0))
    s2 = 9.0
    exp = np.where(np.abs(x) < 1 / s2, 0.5 * s2 * x * x, np.abs(x) - 0.5 / s2)
    np.testing.assert_allclose(y, exp, rtol=1e-6)


def test_losses_masking():
    rpn_cls = np.zeros((1, 2, 2, 8), np.float32)
    rpn_box = np.zeros((1, 2, 2, 24), np.float32)
    labels = np.full(16, -1, np.int32)
    labels[0] = 1
    labels[1] = 0
    tgt = np.zeros((16, 6), np.float32)
    tgt[0] = 1.0          # positive anchor target
    cls_score = np.zeros((4, 2), np.float32)
    bbox_pred = np.zeros((4, 48), np.float32)
    roi_labels = np.array([1, 0, 0, 0], np.int32)
    roi_tgt = np.zeros((4, 48), np.float32)
    roi_valid = np.array([True, True, False, False])
    m = compute_losses(jnp.asarray(rpn_cls), jnp.asarray(rpn_box),
                       jnp.asarray(labels), jnp.asarray(tgt),
                       jnp.asarray(cls_score), jnp.asarray(bbox_pred),
                       jnp.asarray(roi_labels), jnp.asarray(roi_tgt),
                       jnp.asarray(roi_valid))
    # rpn box loss: single positive, |0-1|=1 per dof -> 6*(1-1/18)
    np.testing.assert_allclose(float(m["rpn_loss_box"]),
                               6 * (1 - 0.5 / 9), rtol=1e-5)
    # CE of uniform logits = log(2)
    np.testing.assert_allclose(float(m["rpn_cross_entropy"]),
                               np.log(2), rtol=1e-5)
    np.testing.assert_allclose(float(m["cross_entropy"]), np.log(2), rtol=1e-5)
    assert float(m["loss_box"]) == 0.0


@pytest.mark.slow
def test_train_step_end_to_end(rng):
    params = mv3d.init_params(jax.random.PRNGKey(0))
    step, tx = build_train_step(feat_h=10, feat_w=10, pre_nms_top_n=100,
                                post_nms_top_n=30, rois_per_image=16)
    batch = _batch(rng)

    # train_step donates params/opt_state (train.py) — each call needs
    # fresh pytrees, and pre-step values must be snapshotted to host
    def fresh():
        p = jax.tree.map(jnp.array, params)
        return p, tx.init(p)

    w_before = np.asarray(params["rpn_conv/3x3"]["weights"]).copy()
    p_in, o_in = fresh()
    p1, o1, m1 = step(p_in, o_in, batch, jax.random.PRNGKey(1))
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    assert float(m1["loss"]) > 0
    # params actually moved
    d = np.abs(np.asarray(p1["rpn_conv/3x3"]["weights"]) - w_before).max()
    assert d > 0
    # determinism: same key + inputs -> same metrics
    p_in, o_in = fresh()
    _, _, m2 = step(p_in, o_in, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    # second step decreases nothing catastrophically (finite)
    p2, o2, m3 = step(p1, o1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m3["loss"]))


def test_train_step_s2d_stem(rng):
    """stem_impl='s2d' train step: finite loss, params move, and the
    loss matches the literal-stem step closely (the stems are
    gradient-equivalent up to f32 summation order)."""
    params = mv3d.init_params(jax.random.PRNGKey(0))
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=100,
                  post_nms_top_n=30, rois_per_image=16)
    batch = _batch(rng)

    def run(stem_impl):
        step, tx = build_train_step(stem_impl=stem_impl, **kwargs)
        p = jax.tree.map(jnp.array, params)
        p1, o1, m = step(p, tx.init(p), batch, jax.random.PRNGKey(1))
        return p1, m

    p_lit, m_lit = run(None)
    p_s2d, m_s2d = run("s2d")
    assert np.isfinite(float(m_s2d["loss"]))
    np.testing.assert_allclose(float(m_s2d["loss"]),
                               float(m_lit["loss"]), rtol=1e-3)
    d = np.abs(np.asarray(p_s2d["conv1_1"]["weights"])
               - np.asarray(params["conv1_1"]["weights"])).max()
    assert d > 0  # the stem's own weights receive gradient


def test_train_step_cached_matches_host_feed(rng):
    """build_train_step_cached(dataset, idx) must equal build_train_step
    fed the same frame after the storage round-trip (bf16 bev, uint8
    image) — the device-resident path solver.train_net uses on TPU."""
    import ml_dtypes

    from mv3d_tf_tpu.train import build_train_step_cached

    params = mv3d.init_params(jax.random.PRNGKey(0))
    kwargs = dict(feat_h=10, feat_w=10, pre_nms_top_n=100,
                  post_nms_top_n=30, rois_per_image=16)
    b0, b1 = _batch(rng), _batch(rng)
    data = {}
    for k in b0:
        if k == "im_info":
            continue
        stacked = np.stack([b0[k], b1[k]])
        if k == "bev":
            stacked = stacked.astype(ml_dtypes.bfloat16)
        elif k == "image":
            stacked = stacked.astype(np.uint8)
        data[k] = jnp.asarray(stacked)

    step_c, tx_c = build_train_step_cached(**kwargs)
    step_h, tx_h = build_train_step(**kwargs)

    def fresh(tx):
        p = jax.tree.map(jnp.array, params)
        return p, tx.init(p)

    for idx, b in ((0, b0), (1, b1)):
        # host-feed reference sees the same storage rounding
        bh = dict(b)
        bh["bev"] = np.asarray(b["bev"].astype(ml_dtypes.bfloat16),
                               np.float32)
        bh["image"] = b["image"].astype(np.uint8).astype(np.float32)
        bh.pop("im_info", None)
        p, o = fresh(tx_c)
        _, _, mc = step_c(p, o, data, np.int32(idx), jax.random.PRNGKey(3))
        p, o = fresh(tx_h)
        _, _, mh = step_h(p, o, bh, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(mc["loss"]), float(mh["loss"]),
                                   rtol=1e-6)


def test_lr_decay_schedule_parity():
    """cfg.TRAIN.LR_DECAY builds the staircase schedule the solver
    advertises: constant 1e-5 below STEPSIZE (bit-parity with the
    reference's hardcoded Adam lr, train_mv.py:144), GAMMA-stepped
    after."""
    import optax
    from mv3d_tf_tpu.config import cfg
    schedule = optax.exponential_decay(
        init_value=1e-5, transition_steps=int(cfg.TRAIN.STEPSIZE),
        decay_rate=float(cfg.TRAIN.GAMMA), staircase=True)
    s = int(cfg.TRAIN.STEPSIZE)
    np.testing.assert_allclose(float(schedule(0)), 1e-5, rtol=1e-6)
    # constant below the boundary: f32-identical at 0 and STEPSIZE-1
    assert float(schedule(s - 1)) == float(schedule(0))
    np.testing.assert_allclose(float(schedule(s)), 1e-5 * cfg.TRAIN.GAMMA,
                               rtol=1e-6)
    np.testing.assert_allclose(float(schedule(2 * s)),
                               1e-5 * cfg.TRAIN.GAMMA ** 2, rtol=1e-6)


def test_lr_decay_resume_graft(tmp_path):
    """A constant-lr Adam snapshot grafts into the LR_DECAY (schedule)
    optimizer: Adam count/mu/nu survive and the schedule count resumes
    from the true iteration (solver.train_net's mid-run decay switch)."""
    import jax
    import optax
    from mv3d_tf_tpu.utils.checkpoint import (load_checkpoint_host,
                                              save_checkpoint)
    p = {"a": jnp.arange(3.0), "b": {"w": jnp.ones((2, 2))}}
    tx_const = optax.adam(1e-5)
    s = tx_const.init(p)
    # advance a few steps so count/mu/nu are nontrivial
    for i in range(3):
        g = jax.tree.map(lambda x: x * 0 + 0.1 * (i + 1), p)
        up, s = tx_const.update(g, s, p)
        p = optax.apply_updates(p, up)
    path = save_checkpoint(str(tmp_path), 3, p, s)

    sched = optax.exponential_decay(1e-5, 2, 0.1, staircase=True)
    tx_sched = optax.adam(sched)
    template = tx_sched.init(p)
    restored = load_checkpoint_host(path)
    saved = jax.tree.leaves(restored["opt_state"])
    want = len(jax.tree.leaves(template))
    assert want == len(saved) + 1
    grafted = jax.tree.unflatten(jax.tree.structure(template),
                                 saved + [saved[0]])
    # adam state intact
    np.testing.assert_array_equal(np.asarray(grafted[0].count), 3)
    for a, b in zip(jax.tree.leaves(grafted[0]), jax.tree.leaves(s[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # schedule count continues from the snapshot iteration
    assert int(np.asarray(jax.tree.leaves(grafted[1])[0])) == 3
    # and the next update uses the DECAYED lr (count 3 >= stepsize 2)
    g = jax.tree.map(jnp.ones_like, p)
    up, _ = tx_sched.update(g, grafted, p)
    up_const, _ = tx_const.update(g, s, p)
    r = (np.abs(np.asarray(up["a"])).mean()
         / np.abs(np.asarray(up_const["a"])).mean())
    np.testing.assert_allclose(r, 0.1, rtol=1e-4)
