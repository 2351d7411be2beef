#!/usr/bin/env python
"""Legacy 2D Faster R-CNN demo — parity with the reference tools/demo.py:
20-class VOC detection on images, per-class threshold + NMS, box overlays
saved as PNGs (interactive matplotlib becomes files).

Usage: python tools/demo.py --image <img.jpg> [--weights snap] [--out dir]
"""

import argparse
import os
import os.path as osp
import time

import _init_paths  # noqa: F401
import numpy as np

CLASSES = ("__background__",
           "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
           "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
           "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor")


def parse_args():
    p = argparse.ArgumentParser(description="Faster R-CNN 2D demo")
    p.add_argument("--image", required=True)
    p.add_argument("--weights", dest="model", default=None)
    p.add_argument("--out", default="/tmp/frcnn_demo")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--conf", type=float, default=0.8)
    p.add_argument("--nms", type=float, default=0.3)
    p.add_argument("--bucket", type=int, nargs=2, default=(608, 800),
                   help="static H W padding bucket (multiple of 16)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from mv3d_tf_tpu.data.loader import load_image_bgr
    from mv3d_tf_tpu.eval import PIXEL_MEANS
    from mv3d_tf_tpu.faster_rcnn_2d import build_im_detect_2d
    from mv3d_tf_tpu.models import vggnet
    from mv3d_tf_tpu.ops.nms import nms_np
    from mv3d_tf_tpu.utils.checkpoint import load_pretrained
    from mv3d_tf_tpu.utils.draw import show_image_boxes

    os.makedirs(args.out, exist_ok=True)
    img_raw = load_image_bgr(args.image)
    H, W = args.bucket
    image = np.zeros((H, W, 3), np.float32)
    h = min(img_raw.shape[0], H)
    w = min(img_raw.shape[1], W)
    image[:h, :w] = img_raw[:h, :w] - PIXEL_MEANS
    im_info = np.array([h, w, 1.0], np.float32)

    params = vggnet.init_params_2d(jax.random.PRNGKey(0))
    if args.model:
        params = load_pretrained(params, args.model)

    detect = build_im_detect_2d(H // 16, W // 16,
                                compute_dtype=jnp.bfloat16)
    t0 = time.time()
    out = detect(params, jax.device_put(image), jax.device_put(im_info))
    jax.block_until_ready(out)
    print("Detection took {:.3f}s".format(time.time() - t0))

    scores = np.asarray(out["scores"])
    boxes = np.asarray(out["boxes"])
    valid = np.asarray(out["valid"])
    vis = img_raw[:, :, ::-1].astype(np.uint8)
    total = 0
    for j, cls in enumerate(CLASSES[1:], start=1):
        inds = np.where(valid & (scores[:, j] > args.conf))[0]
        if len(inds) == 0:
            continue
        dets = np.hstack([boxes[inds, 4 * j:4 * (j + 1)],
                          scores[inds, j:j + 1]]).astype(np.float32)
        keep = nms_np(dets, args.nms)
        dets = dets[keep]
        total += len(dets)
        print("{}: {} detections".format(cls, len(dets)))
        vis = show_image_boxes(vis, dets[:, :4])
    from PIL import Image
    out_path = osp.join(args.out,
                        osp.splitext(osp.basename(args.image))[0] + "_det.png")
    Image.fromarray(np.asarray(vis)).save(out_path)
    print("{} total detections -> {}".format(total, out_path))


if __name__ == "__main__":
    main()
