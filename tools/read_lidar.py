#!/usr/bin/env python
"""Batch BEV generation — the reference's offline host loop
(tools/read_lidar.py:117-135) rebuilt as batched on-device rasterization
(benchmark config #2). Same output artifacts: lidar_bv/<idx>.npy
(601,601,9) float32 per velodyne scan.

Usage: python tools/read_lidar.py --root <kitti>/object/training \
           [--count N] [--batch 8] [--device tpu|cpu] [--host]
"""

import argparse
import os
import os.path as osp
import sys
import time

import _init_paths  # noqa: F401
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Velodyne -> BEV rasters")
    p.add_argument("--root", required=True,
                   help="dir containing velodyne/ (output goes to lidar_bv/)")
    p.add_argument("--count", type=int, default=0,
                   help="max scans to process (0 = all)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bucket", type=int, default=131072,
                   help="static point-count bucket per scan")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--host", action="store_true",
                   help="use the numpy reference path instead of the device")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from mv3d_tf_tpu.ops import bev as bev_ops
    from mv3d_tf_tpu.utils import native

    vel_dir = osp.join(args.root, "velodyne")
    out_dir = osp.join(args.root, "lidar_bv")
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(vel_dir) if f.endswith(".bin"))
    if args.count:
        files = files[:args.count]
    if not files:
        print("no velodyne scans under", vel_dir)
        sys.exit(1)

    t0 = time.time()
    n_done = 0
    for start in range(0, len(files), args.batch):
        chunk = files[start:start + args.batch]
        # threaded native C++ IO (numpy fallback inside)
        pts_c, val_c = native.load_velodyne_batch(
            [osp.join(vel_dir, f) for f in chunk], bucket=args.bucket)
        pts = np.zeros((args.batch, args.bucket, 4), np.float32)
        val = np.zeros((args.batch, args.bucket), bool)
        pts[:len(chunk)], val[:len(chunk)] = pts_c, val_c
        if args.host:
            # native C++ rasterizer (bit-identical numpy fallback inside)
            tops = np.stack([native.point_cloud_2_top_host(
                pts[bi][val[bi]]) for bi in range(len(chunk))])
        else:
            tops = np.asarray(bev_ops.point_cloud_2_top_batch(pts, val))
        for bi, fname in enumerate(chunk):
            np.save(osp.join(out_dir, fname.replace(".bin", ".npy")),
                    tops[bi])
            print("Processed:", fname)
            n_done += 1
    dt = time.time() - t0
    print("{} scans in {:.2f}s -> {:.1f} scans/s".format(
        n_done, dt, n_done / max(dt, 1e-9)))


if __name__ == "__main__":
    main()
