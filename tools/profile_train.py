#!/usr/bin/env python
"""Train-step stage attribution by ablation (VERDICT r1 #9).

Leave-one-out inside the fused jit is the honest method on this
platform (per-dispatch tunnel overhead inflates standalone timings), so
this builds VARIANTS of the full train step with stages shrunk/stubbed
and diffs the step times:

  full            - the shipping step (Pallas pool, 12000/2000 NMS)
  small_nms       - pre/post NMS budgets cut to 512/128
  xla_pool        - XLA separable-gather pool instead of Pallas cvjp
  f32_master      - adam on f32 (baseline == this); bf16 compute

Usage: python tools/profile_train.py [--iters 10]
"""

import argparse
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.anchors import get_anchor_grid
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.train import build_train_step

    rng = np.random.RandomState(0)
    # host copy: the train step DONATES params/opt state, so each
    # measure() must device_put a fresh copy (donating a shared device
    # pytree deletes it for the next variant)
    params = jax.tree.map(np.asarray, mv3d.init_params(jax.random.PRNGKey(0)))

    grid = get_anchor_grid(75, 75)
    inside = np.where(grid.inside)[0]
    max_gt = 8
    gt_bv = np.zeros((max_gt, 5), np.float32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_3d = np.zeros((max_gt, 7), np.float32)
    gt_3d[:, 3:6] = 1.0
    gt_cnr = np.zeros((max_gt, 25), np.float32)
    for g in range(4):
        a = inside[(g * 211 + 40) % len(inside)]
        gt_bv[g, :4] = grid.anchors_bv[a]
        gt_bv[g, 4] = 1.0
        gt_valid[g] = True
        gt_3d[g, :6] = np.asarray(G.bv_anchor_to_lidar(gt_bv[g:g+1, :4]))[0]
        gt_3d[g, 6] = 1.0
        gt_cnr[g, :24] = np.asarray(
            G.lidar_3d_to_corners(gt_3d[g:g+1, :6]))[0]
        gt_cnr[g, 24] = 1.0
    batch = {
        "bev": jax.device_put(rng.rand(601, 601, 9).astype(np.float32)),
        "image": jax.device_put(
            (rng.rand(384, 1248, 3) * 255).astype(np.float32)),
        "calib": jax.device_put(np.asarray(
            __import__("__graft_entry__")._example_calib())),
        "gt_boxes_bv": jax.device_put(gt_bv),
        "gt_boxes_3d": jax.device_put(gt_3d),
        "gt_boxes_corners": jax.device_put(gt_cnr),
        "gt_valid": jax.device_put(gt_valid),
    }
    key = jax.random.PRNGKey(0)

    def measure(name, **kw):
        step, tx = build_train_step(compute_dtype=jnp.bfloat16, **kw)
        opt_state = tx.init(params)
        p = jax.device_put(params)
        o = jax.device_put(opt_state)
        t0 = time.perf_counter()
        p, o, m = step(p, o, batch, key)
        float(np.asarray(m["loss"]))
        log("{}: compile+1 {:.1f}s".format(name, time.perf_counter() - t0))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, o, m = step(p, o, batch, key)
        float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / args.iters * 1000
        log("{}: {:.1f} ms/iter".format(name, dt))
        del p, o
        return dt

    import mv3d_tf_tpu.train as T

    full = measure("full")
    small_nms = measure("small_nms", pre_nms_top_n=512, post_nms_top_n=128)
    log("-> proposal/NMS budget share ~ {:.1f} ms".format(full - small_nms))

    # forward-only: the losses WITHOUT grad/adam — the fwd/bwd split
    fl = T.build_forward_losses(compute_dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, b, k: fl(p, b, k)["loss"])
    pd = jax.device_put(params)
    t0 = time.perf_counter()
    float(np.asarray(fwd(pd, batch, key)))
    log("fwd_only: compile+1 {:.1f}s".format(time.perf_counter() - t0))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(pd, batch, key)
    float(np.asarray(out))
    fwd_ms = (time.perf_counter() - t0) / args.iters * 1000
    log("fwd_only: {:.1f} ms/iter".format(fwd_ms))
    log("-> backward+adam share ~ {:.1f} ms".format(full - fwd_ms))
    del pd

    # no-trunk-grad: stop_gradient after feature extraction — the delta
    # vs full is the trunk backward cost
    from mv3d_tf_tpu.models import mv3d as M
    orig_ef = M.extract_features

    def ef_sg(*a, **kw):
        c5, c5_2 = orig_ef(*a, **kw)
        return jax.lax.stop_gradient(c5), jax.lax.stop_gradient(c5_2)

    M.extract_features = ef_sg
    try:
        no_tg = measure("no_trunk_grad")
    finally:
        M.extract_features = orig_ef
    log("-> trunk backward share ~ {:.1f} ms".format(full - no_tg))

    # XLA pool variant: patch build_forward_losses' pool choice
    orig = T.build_forward_losses

    def bfl_xla(**kw):
        kw["pool_impl"] = "xla"
        return orig(**kw)

    T.build_forward_losses = bfl_xla
    try:
        xla_pool = measure("xla_pool")
    finally:
        T.build_forward_losses = orig
    log("-> pallas-vs-xla pool delta ~ {:.1f} ms".format(xla_pool - full))


if __name__ == "__main__":
    main()
