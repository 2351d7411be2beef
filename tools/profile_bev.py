#!/usr/bin/env python
"""Stage-level timing of the BEV rasterization pipeline on the real TPU.

Separates the three stages of point_cloud_2_top_fast (ops/bev.py:135-187)
— bucketing math, the 3-operand stable sort, and the Pallas placement
kernel — so kernel work targets the real milliseconds.
Usage: python tools/profile_bev.py [--batch 8] [--points 131072]
"""

import argparse
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu.geometry import (BEV_C, BEV_H, BEV_W, RES, TOP_X_MAX,
                                      TOP_X_MIN, TOP_Y_MAX)
    from mv3d_tf_tpu.ops import bev as bev_ops
    from mv3d_tf_tpu.ops.bev import SLICE_STARTS, _X_SHIFT, _Y_SHIFT, ZRES
    from mv3d_tf_tpu.ops.bev_pallas import (NO_REM, N_STEPS, ROW_SEGS,
                                            ROWS_PER_STEP, bev_place_pallas)

    log("device:", jax.devices()[0])
    B, N = args.batch, args.points
    rng = np.random.RandomState(0)
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.rand(B, N) * 80 - 10
    pts[..., 1] = rng.rand(B, N) * 80 - 40
    pts[..., 2] = rng.rand(B, N) * 4 - 3
    pts[..., 3] = rng.rand(B, N)
    val = np.ones((B, N), bool)
    ptsd, vald = jax.device_put(pts), jax.device_put(val)

    def barrier(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    def bench(name, fn, *a):
        out = fn(*a)
        barrier(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            barrier(out)
            ts.append((time.perf_counter() - t0) / args.iters)
        ms = min(ts) * 1000
        log("  {:28s} {:8.2f} ms/batch   {:6.1f} scans/s".format(
            name, ms, B / (ms / 1e3)))
        return out, ms

    n_flat = BEV_H * BEV_W * BEV_C
    DUMP = jnp.int32(2 ** 30)

    @jax.jit
    def s_bucket(points, valid):
        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        in_range = (valid
                    & (x > TOP_X_MIN) & (x < TOP_X_MAX)
                    & (y > -TOP_Y_MAX) & (y < TOP_Y_MAX))
        x_img = (-y / RES).astype(jnp.int32) + _X_SHIFT
        y_img = (-x / RES).astype(jnp.int32) + _Y_SHIFT
        cell = y_img * BEV_W + x_img
        slice_idx = jnp.full(x.shape, -1, jnp.int32)
        for i, h0 in enumerate(SLICE_STARTS):
            m = (z >= h0) & (z < h0 + ZRES)
            slice_idx = jnp.where(m, i, slice_idx)
        live = in_range & (slice_idx >= 0)
        return jnp.where(live, cell * BEV_C + slice_idx, DUMP)

    @jax.jit
    def s_sort(seg, points):
        z, r = points[..., 2], points[..., 3]
        return jax.lax.sort([seg, z, r], num_keys=1, is_stable=True)

    @jax.jit
    def s_post(seg_s, zs, rs):
        sentinel = jnp.full(seg_s.shape[:-1] + (1,), -1, jnp.int32)
        seg_next = jnp.concatenate([seg_s[..., 1:], sentinel], axis=-1)
        live_s = seg_s < n_flat
        win_h = (seg_s != seg_next) & live_s
        win_i = ((seg_s // BEV_C) != (seg_next // BEV_C)) & live_s
        row = seg_s // ROW_SEGS
        rem = seg_s - row * ROW_SEGS
        rem_h = jnp.where(win_h, rem, NO_REM)
        rem_i = jnp.where(win_i, (rem // BEV_C) * BEV_C + (BEV_C - 1), NO_REM)
        row_starts = jnp.arange(
            N_STEPS * ROWS_PER_STEP + 1, dtype=jnp.int32) * ROW_SEGS
        bounds = jax.vmap(
            lambda s: jnp.searchsorted(s, row_starts).astype(jnp.int32))(seg_s)
        return rem_h, rem_i, bounds

    log("== bev stages (batch {}, {} pts) ==".format(B, N))
    (seg,), t1 = bench("bucket (cell/slice math)",
                       lambda p, v: (s_bucket(p, v),), ptsd, vald)
    (seg_s, zs, rs), t2 = bench("stable sort (3 operands)", s_sort, seg, ptsd)
    (rem_h, rem_i, bounds), t3 = bench("winners + searchsorted",
                                       s_post, seg_s, zs, rs)
    _, t4 = bench("pallas placement", bev_place_pallas,
                  rem_h, rem_i, zs, rs, bounds)
    log("  {:28s} {:8.2f} ms/batch (sum)".format("stage sum",
                                                 t1 + t2 + t3 + t4))
    _, t5 = bench("FULL fused", bev_ops.point_cloud_2_top_batch, ptsd, vald)


if __name__ == "__main__":
    main()
