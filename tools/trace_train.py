#!/usr/bin/env python
"""jax.profiler trace of the fused train step + top-op table.

Same method as trace_detect.py (direct observation beats the
profile_train LOO subtraction for class attribution): builds exactly
train.build_train_step on the reference batch-1 recipe shapes
(601x601x9 BEV + 384x1248 image, 12000/2000 RPN budgets,
lib/fast_rcnn/train_mv.py:159-183), warms it, traces N steps, prints
the top device ops. Levers: --stem s2d / --nms blocked_fixed /
--pre-nms N mirror bench_ab --train.

Usage:
  python tools/trace_train.py --steps 10 --out /tmp/trace_train
"""

import argparse
import os
import sys
import time

import _init_paths  # noqa: F401
from trace_detect import parse_perfetto


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--stem", default=None, choices=[None, "s2d"])
    ap.add_argument("--nms", default="auto",
                    choices=["auto", "blocked_fixed"])
    ap.add_argument("--pre-nms", type=int, default=None)
    ap.add_argument("--out", default="/tmp/trace_train")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_perfetto(args.out, top=args.top, steps=args.steps)
        return

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.anchors import get_anchor_grid
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.train import build_train_step

    log("device:", jax.devices()[0], "stem:", args.stem,
        "nms:", args.nms, "pre-nms:", args.pre_nms)
    rng = np.random.RandomState(0)
    params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
    kwargs = dict(compute_dtype=jnp.bfloat16, stem_impl=args.stem,
                  nms_impl=args.nms)
    if args.pre_nms is not None:
        kwargs["pre_nms_top_n"] = args.pre_nms
    step, tx = build_train_step(**kwargs)
    opt_state = tx.init(params)

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
        gt_3d[g, :6] = np.asarray(G.bv_anchor_to_lidar(
            gt_bv[g:g + 1, :4]))[0]
        gt_3d[g, 6] = 1.0
        gt_cnr[g, :24] = np.asarray(G.lidar_3d_to_corners(
            gt_3d[g:g + 1, :6]))[0]
        gt_cnr[g, 24] = 1.0
    batch1 = {
        "bev": jax.device_put(rng.rand(601, 601, 9).astype(np.float32)),
        "image": jax.device_put((rng.rand(384, 1248, 3) * 255)
                                .astype(np.float32)),
        "calib": jax.device_put(np.asarray(
            [[707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
              0, 0, 1.0, 0.005],
             [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
              0, 0, 1.0, 0.005],
             [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0],
             [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
              -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]],
            np.float32)),
        "gt_boxes_bv": jax.device_put(gt_bv),
        "gt_boxes_3d": jax.device_put(gt_3d),
        "gt_boxes_corners": jax.device_put(gt_cnr),
        "gt_valid": jax.device_put(gt_valid),
    }
    key = jax.random.PRNGKey(0)

    def run(p, o):
        p, o, m = step(p, o, batch1, key)
        jax.block_until_ready(m["loss"])
        return p, o

    t0 = time.perf_counter()
    p, o = run(params, opt_state)
    log("compile+first: {:.1f}s".format(time.perf_counter() - t0))
    for _ in range(3):
        p, o = run(p, o)

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out, create_perfetto_trace=True)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        p, o = run(p, o)
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    log("traced {} steps at {:.1f} ms/iter".format(args.steps, dt * 1e3))
    parse_perfetto(args.out, top=args.top, steps=args.steps)


if __name__ == "__main__":
    main()
