#!/usr/bin/env python
"""Int8 PTQ accuracy gate: bf16 vs int8 batch detections on synthetic
KITTI frames (VERDICT r1 next-round #1's accuracy check).

Calibrates the quantizer on train-split frames, then compares the two
detectors' outputs on val frames: score deltas, box IoU between matched
detections, and BEV AP against gt for both paths.

Usage: python tools/quant_check.py --kitti_path /tmp/synth_kitti/kitti
       [--frames 16] [--model snapshot]
"""

import argparse
import json
import sys

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti_path", required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--calib_frames", type=int, default=8)
    ap.add_argument("--model", default=None)
    ap.add_argument("--stem", default=None,
                    choices=[None, "bf16", "s2d", "s2d_fused", "s2d_int8"],
                    help="int8-path stem mode (None = bf16)")
    ap.add_argument("--conv-impl", default="xla",
                    choices=["xla", "pallas", "dots", "im2col"])
    ap.add_argument("--int8-head", action="store_true",
                    help="also quantize + gate the fc6/fc7 head")
    ap.add_argument("--int8-rpn", action="store_true",
                    help="also quantize + gate the RPN 3x3 conv")
    ap.add_argument("--no-quant-pool", action="store_true",
                    help="dequantize trunk outputs before the ROI pool "
                         "(bf16 pool/head tail — the shipping mitigation "
                         "for the s2d+quant-pool TPU worker fault)")
    ap.add_argument("--pre-nms", type=int, default=6000,
                    help="pre-NMS top-N for BOTH paths (gate the knee "
                         "config the bench probes run)")
    ap.add_argument("--nms", default="auto",
                    choices=["auto", "blocked_fixed"],
                    help="NMS impl for the INT8 path (gate the exact "
                         "headline config; the bf16 reference keeps "
                         "auto — both are exact-greedy)")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import quant as Q
    from mv3d_tf_tpu.data.kitti import KittiMV3D, prepare_roidb
    from mv3d_tf_tpu.data.kitti_eval import evaluate_bev_ap
    from mv3d_tf_tpu.data.loader import load_image_bgr, pad_image
    from mv3d_tf_tpu.eval import (PIXEL_MEANS, build_detect_batch_fn,
                                  frame_detections)
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.utils.checkpoint import load_pretrained

    params = mv3d.init_params(jax.random.PRNGKey(0))
    if args.model:
        params = load_pretrained(params, args.model)
    params = jax.device_put(params)

    def load_split(split, n):
        imdb = KittiMV3D(split, kitti_path=args.kitti_path)
        prepare_roidb(imdb)
        n = min(n, imdb.num_images)
        bevs, images, calibs, gts = [], [], [], []
        for i in range(n):
            images.append(pad_image(load_image_bgr(imdb.image_path_at(i))))
            bevs.append(np.load(imdb.lidar_path_at(i)).astype(np.float32))
            calibs.append(np.asarray(imdb.calib_at(i), np.float32))
            e = imdb.roidb[i]
            gts.append(e["boxes_bv"][e["gt_classes"] == 1])
        return (np.stack(bevs), np.stack(images), np.stack(calibs), gts)

    cb, ci, cc, _ = load_split("train", args.calib_frames)
    log("calibrating on {} train frames...".format(len(cb)))
    pool_bv = pool_img = None
    if args.int8_head:
        pool_bv, pool_img = Q.calibrate_pooled_features(
            params, cb, ci - PIXEL_MEANS, cc)
    qs = Q.build_quant_state(params, cb, ci - PIXEL_MEANS,
                             pooled_bv=pool_bv, pooled_img=pool_img)

    vb, vi, vc, gts = load_split("val", args.frames)
    B = len(vb)
    det_f16 = build_detect_batch_fn(compute_dtype=jnp.bfloat16,
                                    pre_nms_top_n=args.pre_nms)
    det_int8 = build_detect_batch_fn(compute_dtype=jnp.bfloat16, quant=qs,
                                     quant_conv_impl=args.conv_impl,
                                     stem_impl=args.stem,
                                     quant_rpn=args.int8_rpn,
                                     quant_pool=not args.no_quant_pool,
                                     pre_nms_top_n=args.pre_nms,
                                     nms_impl=args.nms)

    vb_d, vi_d, vc_d = (jax.device_put(vb), jax.device_put(vi),
                        jax.device_put(vc))
    out_f = jax.tree.map(np.asarray, det_f16(params, vb_d, vi_d, vc_d))
    out_q = jax.tree.map(np.asarray, det_int8(params, vb_d, vi_d, vc_d))

    # score agreement over slots valid in both
    both = out_f["valid"] & out_q["valid"]
    ds = np.abs(out_f["scores"][..., 1] - out_q["scores"][..., 1])[both]
    log("valid slots: bf16 {} int8 {} (both {})".format(
        out_f["valid"].sum(), out_q["valid"].sum(), both.sum()))
    log("score |delta| over shared slots: mean {:.4f} p95 {:.4f}".format(
        ds.mean() if len(ds) else -1,
        np.percentile(ds, 95) if len(ds) else -1))

    # BEV AP vs gt for both paths
    def ap_of(out):
        dets = []
        for b in range(B):
            one = {k: out[k][b] for k in ("scores", "boxes_bv",
                                          "boxes_cnr", "boxes_cnr_r",
                                          "valid")}
            per = frame_detections(one, score_thresh=0.05, nms_thresh=0.1)
            dets.append(per.get(1, (np.zeros((0, 5), np.float32),))[0])
        return evaluate_bev_ap(dets, gts, iou_thresh=0.5)["ap"]

    ap_f, ap_q = ap_of(out_f), ap_of(out_q)
    log("BEV AP@0.5: bf16 {:.4f} int8 {:.4f}".format(ap_f, ap_q))
    print(json.dumps({"ap_bf16": round(float(ap_f), 4),
                      "ap_int8": round(float(ap_q), 4),
                      "score_delta_mean": round(float(ds.mean()), 5)
                      if len(ds) else None,
                      "valid_bf16": int(out_f["valid"].sum()),
                      "valid_int8": int(out_q["valid"].sum())}))


if __name__ == "__main__":
    main()
