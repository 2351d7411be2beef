#!/usr/bin/env python
"""MV3D single-frame demo — parity with the reference tools/demo_mv.py:
per-frame inference from raw files (image / velodyne / calib), per-class
threshold + NMS, projected corner overlays on the camera image and box
overlays on the BEV, saved as PNGs (the reference's interactive
matplotlib/mayavi windows become files; benchmark config #1 path).

Usage: python tools/demo_mv.py --root <kitti>/object/training \
           --index 000000 [--weights snap] [--out /tmp/demo]
"""

import argparse
import os
import os.path as osp
import sys
import time

import _init_paths  # noqa: F401
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="MV3D demo")
    p.add_argument("--root", required=True,
                   help="object/training dir with image_2/ velodyne/ calib/")
    p.add_argument("--index", default="000000")
    p.add_argument("--weights", dest="model", default=None)
    p.add_argument("--out", default="/tmp/mv3d_demo")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--conf", type=float, default=0.1,
                   help="score threshold (demo_mv.py:127 uses 0.1)")
    p.add_argument("--nms", type=float, default=0.1,
                   help="NMS threshold (demo_mv.py:125 uses 0.1)")
    return p.parse_args()


def load_calib_file(path):
    """KITTI calib txt -> (4,12) blob (demo_mv.py make_calib parity)."""
    with open(path) as f:
        lines = [l for l in f.readlines() if l.strip()]
    vals = [np.array(l.strip().split(" ")[1:], np.float32) for l in lines]
    calib = np.zeros((4, 12), np.float32)
    calib[0] = vals[2][:12]
    calib[1] = vals[3][:12]
    calib[2, :9] = vals[4][:9]
    calib[3] = vals[5][:12]
    return calib


def main():
    args = parse_args()
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp
    from mv3d_tf_tpu.data.loader import load_image_bgr, pad_image
    from mv3d_tf_tpu.eval import build_detect_fn, frame_detections
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.ops import bev as bev_ops
    from mv3d_tf_tpu.utils.checkpoint import load_pretrained
    from mv3d_tf_tpu.utils.draw import (show_bev_detections,
                                        show_image_boxes, show_lidar_corners,
                                        show_pointcloud_3d)

    os.makedirs(args.out, exist_ok=True)
    image_path = osp.join(args.root, "image_2", args.index + ".png")
    velo_path = osp.join(args.root, "velodyne", args.index + ".bin")
    calib_path = osp.join(args.root, "calib", args.index + ".txt")
    bv_path = osp.join(args.root, "lidar_bv", args.index + ".npy")

    image_raw = load_image_bgr(image_path)
    calib = load_calib_file(calib_path)
    if osp.exists(bv_path):
        bev = np.load(bv_path).astype(np.float32)
    else:
        scan = bev_ops.load_velodyne(velo_path)
        p, v = bev_ops.pad_points(scan)
        bev = np.asarray(bev_ops.point_cloud_2_top(p, v))
    image = pad_image(image_raw)

    params = mv3d.init_params(jax.random.PRNGKey(0))
    if args.model:
        params = load_pretrained(params, args.model)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    detect = build_detect_fn(compute_dtype=dtype)
    t0 = time.time()
    det = detect(params, jax.device_put(bev), jax.device_put(image),
                 jax.device_put(calib))
    jax.block_until_ready(det)
    print("Detection took {:.3f}s".format(time.time() - t0))

    per_cls = frame_detections(det, score_thresh=args.conf,
                               nms_thresh=args.nms)
    from PIL import Image
    for j, (dets_bv, dets_cnr, dets_cnr_r) in per_cls.items():
        print("class {}: {} detections".format(j, len(dets_bv)))
        img_vis = show_lidar_corners(image_raw[:, :, ::-1].astype(np.uint8),
                                     dets_cnr[:, :24], calib)
        bev_vis = show_bev_detections(bev, dets_bv[:, :4])
        Image.fromarray(img_vis).save(
            osp.join(args.out, "{}_cls{}_img.png".format(args.index, j)))
        Image.fromarray(bev_vis).save(
            osp.join(args.out, "{}_cls{}_bev.png".format(args.index, j)))
        # headless 3D render: point cloud + unregressed (green) and
        # regressed (magenta) corner wireframes — replaces the
        # reference's interactive mayavi window (demo_mv.py:171-180)
        if osp.exists(velo_path):
            scan = bev_ops.load_velodyne(velo_path)
            pc3d = show_pointcloud_3d(
                scan, [dets_cnr[:, :24], dets_cnr_r[:, :24]],
                colors=[(64, 255, 64), (255, 64, 255)])
            Image.fromarray(pc3d).save(
                osp.join(args.out, "{}_cls{}_3d.png".format(args.index, j)))
    print("wrote overlays to", args.out)


if __name__ == "__main__":
    main()
