#!/usr/bin/env python
"""Pre-NMS top-K recall knee (VERDICT r2 #2): the reference test config
feeds 6000 score-sorted candidates into the RPN's BEV NMS
(experiments/cfgs/faster_rcnn_end2end.yml TEST.RPN_PRE_NMS_TOP_N,
lib/rpn_msr/proposal_layer_tf.py:161-167) but only 300 survive. NMS cost
scales with the candidate count, so if the top-300 keep set is already
determined by a much smaller K, the proposal stage can shrink within
accuracy parity. This tool measures exactly that on real (trained)
proposals: keep-set agreement vs the K=6000 baseline, BEV AP@0.5/0.7,
and the detect-graph time per batch at each K.

Usage: python tools/prenms_knee.py --kitti_path /tmp/kitti_synth_50k
       --model output/accuracy_50k/<snapshot> [--frames 64]
"""

import argparse
import json
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti_path", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ks", type=int, nargs="+",
                    default=[6000, 3000, 2048, 1024, 512])
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu.data.kitti import KittiMV3D, prepare_roidb
    from mv3d_tf_tpu.data.kitti_eval import evaluate_bev_ap
    from mv3d_tf_tpu.data.loader import load_image_bgr, pad_image
    from mv3d_tf_tpu.eval import build_detect_batch_fn, frame_detections
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.utils.checkpoint import load_pretrained

    params = mv3d.init_params(jax.random.PRNGKey(0))
    if args.model:
        params = load_pretrained(params, args.model)
    params = jax.device_put(params)

    imdb = KittiMV3D("val", kitti_path=args.kitti_path)
    prepare_roidb(imdb)
    n = min(args.frames, imdb.num_images)
    B = args.batch
    n -= n % B
    log("frames:", n, " batch:", B)
    gts = [imdb.roidb[i]["boxes_bv"][imdb.roidb[i]["gt_classes"] == 1]
           for i in range(n)]

    def batches():
        for s in range(0, n, B):
            bevs = np.stack([np.load(imdb.lidar_path_at(i)).astype(
                np.float32) for i in range(s, s + B)])
            imgs = np.stack([pad_image(load_image_bgr(
                imdb.image_path_at(i))) for i in range(s, s + B)])
            cals = np.stack([np.asarray(imdb.calib_at(i), np.float32)
                             for i in range(s, s + B)])
            yield (jax.device_put(bevs), jax.device_put(imgs),
                   jax.device_put(cals))

    data = list(batches())
    results = {}
    base_rois = None
    report = []
    for k in args.ks:
        detect = build_detect_batch_fn(compute_dtype=jnp.bfloat16,
                                       pre_nms_top_n=k)
        outs = []
        t0 = time.perf_counter()
        out = detect(params, *data[0])
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for d in data:
            outs.append(detect(params, *d))
        jax.block_until_ready(outs[-1])
        ms = (time.perf_counter() - t0) / len(data) * 1000
        outs = [jax.tree.map(np.asarray, o) for o in outs]

        # keep-set agreement: fraction of the baseline's valid rois_3d
        # rows that appear (any slot) in this K's output, per frame
        rois = np.concatenate([o["rois_3d"].reshape(B, -1, 7)
                               for o in outs], 0)
        valid = np.concatenate([o["valid"] for o in outs], 0)
        if base_rois is None:
            base_rois, base_valid = rois, valid
            agree = 1.0
        else:
            hit = 0
            tot = 0
            for f in range(n):
                ref = base_rois[f][base_valid[f] > 0][:, 1:]
                got = rois[f][valid[f] > 0][:, 1:]
                tot += len(ref)
                if len(got) and len(ref):
                    d = np.abs(ref[:, None] - got[None]).max(-1)
                    hit += int((d.min(1) < 1e-3).sum())
            agree = hit / max(tot, 1)

        dets = []
        fi = 0
        for o in outs:
            for b in range(B):
                one = {key: o[key][b] for key in
                       ("scores", "boxes_bv", "boxes_cnr", "boxes_cnr_r",
                        "valid")}
                per = frame_detections(one, score_thresh=0.05,
                                       nms_thresh=0.1)
                dets.append(per.get(1, (np.zeros((0, 5), np.float32),))[0])
                fi += 1
        ap5 = evaluate_bev_ap(dets, gts, iou_thresh=0.5)["ap"]
        ap7 = evaluate_bev_ap(dets, gts, iou_thresh=0.7)["ap"]
        row = {"pre_nms": k, "ms_per_batch": round(ms, 2),
               "keep_agree_vs_6000": round(float(agree), 4),
               "bev_ap@0.5": round(float(ap5), 4),
               "bev_ap@0.7": round(float(ap7), 4),
               "compile_s": round(compile_s, 1),
               "valid_mean": round(float(valid.sum() / n), 1)}
        report.append(row)
        log(row)
        results[k] = row

    print(json.dumps(report))


if __name__ == "__main__":
    main()
