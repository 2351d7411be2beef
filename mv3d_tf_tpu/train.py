"""Training: the reference's SolverWrapper (lib/fast_rcnn/train_mv.py)
re-built as one jit-compiled train step — trunks, RPN, anchor targets,
proposal layer, proposal targets, dual ROI pooling, fusion head, 4-term
loss, and the Adam update all execute as a single XLA program per
iteration (the reference pays 3 host py_func round-trips + CUDA NMS here).

Loss parity (train_mv.py:92-136):
  * RPN softmax CE over anchors with label != -1 (masked mean);
  * RPN smooth-L1 (sigma=3) summed over the 6 dof, mean over label==1;
  * RCNN CE over the 128 sampled rois (masked mean over valid slots);
  * RCNN smooth-L1 (sigma=3) over the FULL (N, 48) pred-vs-target block —
    background rows regress toward zero, a quirk the reference keeps;
  * total = simple sum; Adam lr = 1e-5 HARDCODED (train_mv.py:144,
    bypassing cfg.TRAIN.LEARNING_RATE) — exposed as a parameter here with
    the same default;
  * NO weight decay: the reference attaches l2 regularizers to fc weights
    (network.py:392) but never adds tf's REGULARIZATION_LOSSES to the
    optimized loss, so they are dead code.

Gradients do not flow through proposal coordinates or sampling decisions
(the reference's py_funcs have no gradient) — stop_gradient pins that.
"""

import functools

import jax
import jax.numpy as jnp
import optax

from mv3d_tf_tpu.eval import PIXEL_MEANS
from mv3d_tf_tpu.models import mv3d
from mv3d_tf_tpu.ops.roi_pool import roi_pool, roi_pool_train
from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD, proposal_layer_3d
from mv3d_tf_tpu.targets import anchor_target_layer, proposal_target_layer_3d


def smooth_l1(diff, sigma=3.0):
    """train_mv.py:67-84."""
    sigma2 = sigma * sigma
    a = jnp.abs(diff)
    return jnp.where(a < 1.0 / sigma2,
                     0.5 * sigma2 * diff * diff,
                     a - 0.5 / sigma2)


def _masked_mean(x, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def compute_losses(rpn_cls_score, rpn_bbox_pred, rpn_labels, rpn_bbox_targets,
                   cls_score, bbox_pred, roi_labels, roi_bbox_targets,
                   roi_valid):
    """The 4-term loss (train_mv.py:92-136), fixed-shape + masks."""
    # RPN classification over label != -1
    logits = rpn_cls_score.reshape(-1, 2).astype(jnp.float32)
    keep = (rpn_labels != -1).astype(jnp.float32)
    labels01 = jnp.maximum(rpn_labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels01)
    rpn_cross_entropy = _masked_mean(ce, keep)

    # RPN box regression over label == 1 (sum over 6 dof, mean over pos)
    pos = (rpn_labels == 1).astype(jnp.float32)
    deltas = rpn_bbox_pred.reshape(-1, 6).astype(jnp.float32)
    sl1 = jnp.sum(smooth_l1(deltas - rpn_bbox_targets), axis=1)
    rpn_loss_box = _masked_mean(sl1, pos)

    # RCNN classification over the sampled rois
    rvalid = roi_valid.astype(jnp.float32)
    rce = optax.softmax_cross_entropy_with_integer_labels(
        cls_score.astype(jnp.float32), roi_labels)
    cross_entropy = _masked_mean(rce, rvalid)

    # RCNN corner regression over the FULL (N, 48) block (reference quirk)
    rsl1 = jnp.sum(smooth_l1(bbox_pred.astype(jnp.float32)
                             - roi_bbox_targets), axis=1)
    loss_box = _masked_mean(rsl1, rvalid)

    total = cross_entropy + loss_box + rpn_cross_entropy + rpn_loss_box
    return {
        "loss": total,
        "rpn_cross_entropy": rpn_cross_entropy,
        "rpn_loss_box": rpn_loss_box,
        "cross_entropy": cross_entropy,
        "loss_box": loss_box,
    }


def build_forward_losses(feat_h=75, feat_w=75, pre_nms_top_n=12000,
                         post_nms_top_n=2000, rpn_nms_thresh=0.7,
                         rois_per_image=128, keep_prob=0.5,
                         compute_dtype=None, pool_impl="train",
                         stem_impl=None, roi_chunk=None,
                         nms_impl="auto"):
    """Per-frame forward + 4-term loss as a pure function
    (params, batch, key) -> metrics dict.  vmap-able over frames for
    data-parallel training (parallel/mesh.py — which passes
    pool_impl="xla": the Pallas custom-vjp pool is single-frame and is
    not exercised under vmap/shard_map).

    stem_impl="s2d" runs conv1 as the space-to-depth packed convs
    (ops/stem_s2d.py — differentiable, gradient-equivalent to the
    literal stem per tests/test_stem_s2d.py).
    roi_chunk (xla pool only) processes rois in sequential blocks of
    this size, and the xla pool is rematerialized (jax.checkpoint):
    autodiff through the unrolled max chain otherwise saves every
    (rois, pooled, W, C) intermediate — ~30 x 1.07 GiB slabs when the
    per-frame losses are vmapped over 8 frames (ab_train_literal.log
    OOM, 34.4 G) — while remat+chunk re-derives them blockwise in the
    backward for ~one extra pool's FLOPs."""
    if pool_impl == "train":
        pool = roi_pool_train
    else:
        def pool(feat, rois, **kw):
            def inner(f, r):
                return roi_pool(f, r, chunk=roi_chunk, **kw)
            return jax.checkpoint(inner)(feat, rois)
    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    def forward_losses(params, batch, key):
        k_anchor, k_roi, k_drop = jax.random.split(key, 3)
        image = batch["image"].astype(jnp.float32) - PIXEL_MEANS
        c5, c5_2 = mv3d.extract_features(params, batch["bev"][None],
                                         image[None], dtype=compute_dtype,
                                         stem_impl=stem_impl)
        rpn_cls, rpn_box = mv3d.rpn_head(params, c5, dtype=compute_dtype)
        prob = mv3d.rpn_probs(rpn_cls)

        rpn_labels, rpn_bbox_targets = anchor_target_layer(
            k_anchor, batch["gt_boxes_bv"], batch["gt_valid"],
            batch["gt_boxes_3d"], feat_h, feat_w)

        rois = proposal_layer_3d(
            jax.lax.stop_gradient(prob),
            jax.lax.stop_gradient(rpn_box.astype(jnp.float32)),
            batch["calib"], feat_h, feat_w,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n,
            nms_thresh=rpn_nms_thresh, nms_impl=nms_impl)

        roi_data = proposal_target_layer_3d(
            k_roi, rois["rois_bv"], rois["rois_3d"], rois["valid"],
            batch["gt_boxes_bv"], batch["gt_valid"], batch["gt_boxes_3d"],
            batch["gt_boxes_corners"], batch["calib"],
            rois_per_image=rois_per_image)

        pooled_bv = pool(c5[0], roi_data["rois_bv"], spatial_scale=1. / 8)
        pooled_img = pool(c5_2[0], roi_data["rois_img"],
                          spatial_scale=1. / 8,
                          max_in_h=max_img_h, max_in_w=max_img_w)
        cls_score, _, bbox_pred = mv3d.fusion_head(
            params, pooled_bv.astype(jnp.float32),
            pooled_img.astype(jnp.float32),
            keep_prob=keep_prob, rng=k_drop, train=True)

        return compute_losses(
            rpn_cls.astype(jnp.float32), rpn_box, rpn_labels,
            rpn_bbox_targets, cls_score, bbox_pred, roi_data["labels"],
            roi_data["bbox_targets"], roi_data["valid"])

    return forward_losses


def build_train_step(feat_h=75, feat_w=75, pre_nms_top_n=12000,
                     post_nms_top_n=2000, rpn_nms_thresh=0.7,
                     rois_per_image=128, keep_prob=0.5, lr=1e-5,
                     compute_dtype=None, optimizer=None, stem_impl=None,
                     nms_impl="auto"):
    """Build (train_step, optimizer).  train_step is fully jitted.

    Batch dict (one frame, fixed shapes):
      bev (601,601,9), image (H,W,3) raw BGR, calib (4,12),
      gt_boxes_bv (MAX_GT,5), gt_boxes_3d (MAX_GT,7),
      gt_boxes_corners (MAX_GT,25), gt_valid (MAX_GT,) bool.
    """
    tx = optimizer if optimizer is not None else optax.adam(lr)
    forward_losses = build_forward_losses(
        feat_h=feat_h, feat_w=feat_w, pre_nms_top_n=pre_nms_top_n,
        post_nms_top_n=post_nms_top_n, rpn_nms_thresh=rpn_nms_thresh,
        rois_per_image=rois_per_image, keep_prob=keep_prob,
        compute_dtype=compute_dtype, stem_impl=stem_impl,
        nms_impl=nms_impl)

    # params + opt state (~1.5 GB f32) are donated: the updated pytrees
    # reuse the input buffers in place instead of allocating fresh HBM
    # every iteration. Callers must rebind (p, o = step(p, o, ...)) —
    # every solver loop does; reusing the old arrays raises.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            m = forward_losses(p, batch, key)
            return m["loss"], m
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, tx


def build_train_step_cached(**kwargs):
    """build_train_step over a DEVICE-RESIDENT dataset: the step takes
    (params, opt_state, data, idx, key) where data is a dict of stacked
    per-frame arrays pinned on the device (bev may be bf16, image uint8 —
    both are cast back before the graph, bit-identical under a bf16
    trunk) and idx selects the frame with an on-device dynamic slice.

    Why: feeding per-iteration numpy batches pays the full ~19 MB/frame
    host->device transfer on the step's critical path — 1.4-2.2 s/iter
    over the axon device tunnel vs ~86 ms of compute (r3 accuracy run).
    One up-front transfer of the whole roidb removes the hot-loop
    transfer entirely (solver.train_net builds the cache when it fits
    cfg.TPU.TRAIN_DATA_HBM_GB).
    """
    tx = kwargs.pop("optimizer", None) or optax.adam(kwargs.pop("lr", 1e-5))
    inner, _ = build_train_step(optimizer=tx, **kwargs)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, data, idx, key):
        batch = {k: jax.lax.dynamic_index_in_dim(v, idx, 0, keepdims=False)
                 for k, v in data.items()}
        batch["bev"] = batch["bev"].astype(jnp.float32)
        batch["image"] = batch["image"].astype(jnp.float32)
        return inner(params, opt_state, batch, key)

    return train_step, tx


def filter_roidb(roidb, fg_thresh=0.5, bg_hi=0.5, bg_lo=0.1):
    """Drop entries with no usable fg or bg rois (train_mv.py:347-370)."""
    import numpy as np

    def is_valid(entry):
        overlaps = entry["max_overlaps"]
        fg = np.where(overlaps >= fg_thresh)[0]
        bg = np.where((overlaps < bg_hi) & (overlaps >= bg_lo))[0]
        return len(fg) > 0 or len(bg) > 0

    filtered = [e for e in roidb if is_valid(e)]
    print("Filtered {} roidb entries: {} -> {}".format(
        len(roidb) - len(filtered), len(roidb), len(filtered)))
    return filtered
