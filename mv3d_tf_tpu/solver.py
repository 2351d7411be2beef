"""Solver: training loop + full-dataset evaluation drivers.

train_net mirrors lib/fast_rcnn/train_mv.py:87-219/373-382 (loss display
cadence, snapshot cadence, speed print) on top of the single-graph
train_step; test_net mirrors lib/fast_rcnn/test_mv.py:321-517 (per-frame
detect, per-class threshold+NMS, top-300 cap, detections pickle, KITTI
result writing).
"""

import os
import pickle

import jax
import numpy as np

from mv3d_tf_tpu.config import cfg, get_output_dir
from mv3d_tf_tpu.data.loader import RoIDataLayer, get_minibatch
from mv3d_tf_tpu.eval import build_detect_fn, frame_detections
from mv3d_tf_tpu.models import mv3d
from mv3d_tf_tpu.train import build_train_step, filter_roidb
from mv3d_tf_tpu.utils.checkpoint import load_pretrained, save_checkpoint
from mv3d_tf_tpu.utils.timer import Timer


def train_net(imdb, roidb, output_dir, pretrained_model=None,
              max_iters=10000, compute_dtype=None, seed=None,
              display=None, snapshot_iters=None, log=print):
    """Train MV3D on a roidb. Returns final params."""
    roidb = filter_roidb(roidb)
    display = cfg.TRAIN.DISPLAY if display is None else display
    snapshot_iters = (cfg.TRAIN.SNAPSHOT_ITERS if snapshot_iters is None
                      else snapshot_iters)

    key = jax.random.PRNGKey(cfg.RNG_SEED if seed is None else seed)
    key, k_init = jax.random.split(key)
    params = mv3d.init_params(k_init)
    if pretrained_model is not None:
        log("Loading pretrained model weights from {:s}".format(
            pretrained_model))
        params = load_pretrained(params, pretrained_model)

    step, tx = build_train_step(
        pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
        post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
        rpn_nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
        rois_per_image=cfg.TRAIN.BATCH_SIZE,
        compute_dtype=compute_dtype)
    opt_state = tx.init(params)
    data_layer = RoIDataLayer(roidb, imdb.num_classes)

    timer = Timer()
    last_snapshot_iter = -1
    for it in range(max_iters):
        blobs = data_layer.forward()
        batch = {k: blobs[k] for k in ("bev", "image", "calib", "gt_boxes_bv",
                                       "gt_boxes_3d", "gt_boxes_corners",
                                       "gt_valid")}
        key, k_step = jax.random.split(key)
        timer.tic()
        params, opt_state, m = step(params, opt_state, batch, k_step)
        jax.block_until_ready(m)
        timer.toc()

        if (it + 1) % display == 0:
            log("iter: %d / %d, total loss: %.4f, rpn_loss_cls: %.4f, "
                "rpn_loss_box: %.4f, loss_cls: %.4f, loss_box: %.4f"
                % (it + 1, max_iters, float(m["loss"]),
                   float(m["rpn_cross_entropy"]), float(m["rpn_loss_box"]),
                   float(m["cross_entropy"]), float(m["loss_box"])))
            log("speed: {:.3f}s / iter".format(timer.average_time))

        if (it + 1) % snapshot_iters == 0:
            last_snapshot_iter = it
            save_checkpoint(output_dir, it + 1, params, opt_state)

    if last_snapshot_iter != max_iters - 1:
        save_checkpoint(output_dir, max_iters, params, opt_state)
    return params


def test_net(params, imdb, weights_filename="default", max_per_image=300,
             thresh=0.05, compute_dtype=None, log=print):
    """Evaluate over an imdb; returns (all_boxes, all_boxes_cnr).

    test_mv.py:321-517 structure: all_boxes[cls][image] = (N,5) BEV dets,
    all_boxes_cnr[cls][image] = (N,25) corner dets.
    """
    num_images = imdb.num_images
    k = imdb.num_classes
    all_boxes = [[[] for _ in range(num_images)] for _ in range(k)]
    all_boxes_cnr = [[[] for _ in range(num_images)] for _ in range(k)]
    output_dir = get_output_dir(imdb, weights_filename)

    detect = build_detect_fn(
        pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
        post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
        rpn_nms_thresh=cfg.TEST.RPN_NMS_THRESH,
        compute_dtype=compute_dtype)

    timers = {"im_detect": Timer(), "misc": Timer()}
    for i in range(num_images):
        entry = {"image_path": imdb.image_path_at(i),
                 "lidar_bv_path": imdb.lidar_path_at(i),
                 "calib": imdb.calib_at(i),
                 "gt_classes": np.zeros(0, np.int32)}
        from mv3d_tf_tpu.data.loader import load_image_bgr, pad_image
        image = pad_image(load_image_bgr(entry["image_path"]))
        bev = np.load(entry["lidar_bv_path"]).astype(np.float32)

        timers["im_detect"].tic()
        det = detect(params, jax.device_put(bev), jax.device_put(image),
                     jax.device_put(entry["calib"]))
        jax.block_until_ready(det)
        timers["im_detect"].toc()

        timers["misc"].tic()
        per_cls = frame_detections(det, num_classes=k, score_thresh=thresh,
                                   nms_thresh=cfg.TEST.NMS,
                                   max_per_image=max_per_image)
        for j, (dets_bv, dets_cnr, dets_cnr_r) in per_cls.items():
            all_boxes[j][i] = dets_bv
            all_boxes_cnr[j][i] = dets_cnr
        timers["misc"].toc()
        log("im_detect: {:d}/{:d} {:.3f}s {:.3f}s".format(
            i + 1, num_images, timers["im_detect"].average_time,
            timers["misc"].average_time))

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(output_dir, "detections_cnr.pkl"), "wb") as f:
        pickle.dump(all_boxes_cnr, f, pickle.HIGHEST_PROTOCOL)

    log("Evaluating detections")
    imdb.evaluate_detections(all_boxes, all_boxes_cnr, output_dir)
    return all_boxes, all_boxes_cnr
