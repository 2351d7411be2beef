"""Legacy 2D Faster R-CNN algorithm stages (proposal layer, target
layers, im_detect) — the reference repo's original py-faster-rcnn surface
(lib/rpn_msr/proposal_layer_tf.py:205-331, anchor_target_layer_tf.py,
proposal_target_layer_tf.py:97-170,300-346, lib/fast_rcnn/test.py),
rebuilt jit-pure with fixed shapes.

NOTE ON REFERENCE BREAKAGE (documented divergence): the repo's own legacy
2D wiring is non-functional as written — the 2D proposal layer decodes
4-col deltas through the 3D transform (proposal_layer_tf.py:289-292) and
VGGnet_train feeds im_info into the gt_boxes_3d argument slot
(VGGnet_train.py:57 vs the py_func signature). This module implements the
*canonical* Faster R-CNN semantics those files originally had (classic
bbox_transform decode, 2D anchor targets), which is what tools/demo.py
needs to actually work.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.anchors import generate_anchors, inside_image_mask, \
    shift_anchors
from mv3d_tf_tpu.ops.iou import bbox_overlaps
from mv3d_tf_tpu.ops.nms import nms_matrix, top_k_by_score
from mv3d_tf_tpu.targets import _sample_mask

_GRID2D_CACHE = {}


def get_anchor_grid_2d(height, width, feat_stride=16, scales=(8, 16, 32)):
    key = (height, width, feat_stride, scales)
    if key not in _GRID2D_CACHE:
        base = generate_anchors(scales=np.array(scales))
        _GRID2D_CACHE[key] = shift_anchors(base, height, width, feat_stride)
    return _GRID2D_CACHE[key]


def rpn_fg_scores_2d(rpn_cls_prob):
    """(1,h,w,2A) pairwise-softmax probs -> (h*w*A,) fg scores."""
    b, h, w, c = rpn_cls_prob.shape
    return rpn_cls_prob.reshape(b, h, w, c // 2, 2)[..., 1].reshape(-1)


@functools.partial(jax.jit, static_argnames=(
    "feat_h", "feat_w", "feat_stride", "pre_nms_top_n", "post_nms_top_n",
    "min_size"))
def proposal_layer_2d(rpn_cls_prob, rpn_bbox_pred, im_info,
                      feat_h, feat_w, feat_stride=16,
                      pre_nms_top_n=6000, post_nms_top_n=300,
                      nms_thresh=0.7, min_size=16):
    """Classic 2D proposals: decode -> clip -> min-size -> top-K -> NMS.

    im_info: (3,) [im_h, im_w, im_scale] (traced — images vary per frame).
    Returns rois (P,5) [0,x1,y1,x2,y2], scores (P,), valid (P,).
    """
    anchors = jnp.asarray(get_anchor_grid_2d(feat_h, feat_w, feat_stride))
    scores = rpn_fg_scores_2d(rpn_cls_prob)
    deltas = rpn_bbox_pred.reshape(-1, 4)

    proposals = G.bbox_transform_inv(anchors, deltas)
    proposals = G.clip_boxes(proposals, (im_info[0], im_info[1]))

    ws = proposals[:, 2] - proposals[:, 0] + 1.0
    hs = proposals[:, 3] - proposals[:, 1] + 1.0
    thr = min_size * im_info[2]
    keep = (ws >= thr) & (hs >= thr)

    k = min(pre_nms_top_n, scores.shape[0])
    top_idx, top_valid = top_k_by_score(scores, keep, k)
    props = proposals[top_idx]
    psc = scores[top_idx]

    keep_idx, keep_valid = nms_matrix(props, psc, top_valid,
                                      post_nms_top_n, nms_thresh)
    zeros = jnp.zeros((post_nms_top_n, 1), jnp.float32)
    rois = jnp.concatenate([zeros, props[keep_idx]], axis=1)
    mask = keep_valid[:, None].astype(jnp.float32)
    return rois * mask, psc[keep_idx] * keep_valid, keep_valid


@functools.partial(jax.jit, static_argnames=(
    "feat_h", "feat_w", "feat_stride", "rpn_batch"))
def anchor_target_layer_2d(key, gt_boxes, gt_valid, im_info,
                           feat_h, feat_w, feat_stride=16, rpn_batch=256,
                           fg_fraction=0.5, pos_overlap=0.7,
                           neg_overlap=0.3):
    """Classic RPN targets: labels in {-1,0,1} over the full grid +
    4-dof bbox targets (canonical py-faster-rcnn semantics)."""
    anchors_np = get_anchor_grid_2d(feat_h, feat_w, feat_stride)
    anchors = jnp.asarray(anchors_np)
    total = anchors.shape[0]
    # inside mask vs the (traced) image extent
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))

    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    argmax = jnp.argmax(overlaps, axis=1)
    max_ovr = jnp.maximum(jnp.max(overlaps, axis=1), 0.0)
    ovl_in = jnp.where(inside[:, None], overlaps, -1.0)
    gt_max = jnp.max(ovl_in, axis=0)
    is_gt_best = jnp.any((ovl_in == gt_max[None, :]) & gt_valid[None, :],
                         axis=1)

    fg_pool = inside & (is_gt_best | (max_ovr >= pos_overlap))
    k_fg, k_bg = jax.random.split(key)
    fg_sel = _sample_mask(k_fg, fg_pool, int(fg_fraction * rpn_batch))
    n_fg = jnp.sum(fg_sel)
    bg_cand = inside & (max_ovr < neg_overlap) & ~fg_sel
    bg_sel = _sample_mask(k_bg, bg_cand, rpn_batch - n_fg)

    labels = jnp.full((total,), -1, jnp.int32)
    labels = jnp.where(bg_sel, 0, labels)
    labels = jnp.where(fg_sel, 1, labels)

    tgt = G.bbox_transform(anchors, gt_boxes[argmax, :4])
    bbox_targets = jnp.where(inside[:, None], tgt, 0.0)
    return labels, bbox_targets


@functools.partial(jax.jit, static_argnames=("num_classes", "rois_per_image",
                                             "bbox_normalize"))
def proposal_target_layer_2d(key, rois, rois_valid, gt_boxes, gt_valid,
                             num_classes=21, rois_per_image=128,
                             fg_fraction=0.25, fg_thresh=0.5,
                             bg_thresh_hi=0.5, bg_thresh_lo=0.1,
                             bbox_normalize=False,
                             normalize_means=(0., 0., 0., 0.),
                             normalize_stds=(0.1, 0.1, 0.2, 0.2)):
    """Classic RoI sampling + 4-of-4K targets + inside/outside weights
    (proposal_target_layer_tf.py:97-170)."""
    gt_as_roi = jnp.concatenate(
        [jnp.zeros((gt_boxes.shape[0], 1)), gt_boxes[:, :4]], axis=1)
    all_rois = jnp.concatenate([rois, gt_as_roi], axis=0)
    all_valid = jnp.concatenate([rois_valid, gt_valid], axis=0)
    n_all = all_rois.shape[0]

    overlaps = bbox_overlaps(all_rois[:, 1:5], gt_boxes[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    assignment = jnp.argmax(overlaps, axis=1)
    max_ovr = jnp.maximum(jnp.max(overlaps, axis=1), 0.0)
    roi_labels = gt_boxes[assignment, 4]

    fg_quota = int(round(fg_fraction * rois_per_image))
    k_fg, k_bg = jax.random.split(key)
    fg_sel = _sample_mask(k_fg, all_valid & (max_ovr >= fg_thresh), fg_quota)
    n_fg = jnp.sum(fg_sel)
    bg_sel = _sample_mask(
        k_bg, all_valid & (max_ovr < bg_thresh_hi) & (max_ovr >= bg_thresh_lo),
        rois_per_image - n_fg)
    n_keep = n_fg + jnp.sum(bg_sel)

    pri_fg = jnp.where(fg_sel, jax.random.uniform(k_fg, (n_all,)), -1e30)
    rank_fg = jnp.zeros((n_all,), jnp.int32).at[jnp.argsort(-pri_fg)].set(
        jnp.arange(n_all, dtype=jnp.int32))
    pri_bg = jnp.where(bg_sel, jax.random.uniform(k_bg, (n_all,)), -1e30)
    rank_bg = jnp.zeros((n_all,), jnp.int32).at[jnp.argsort(-pri_bg)].set(
        jnp.arange(n_all, dtype=jnp.int32))
    slot = jnp.where(fg_sel, rank_fg,
                     jnp.where(bg_sel, n_fg + rank_bg, rois_per_image))

    def scatter(x):
        shape = (rois_per_image + 1,) + x.shape[1:]
        return jnp.zeros(shape, x.dtype).at[slot].set(x)[:rois_per_image]

    out_rois = scatter(all_rois)
    out_labels = scatter(jnp.where(fg_sel, roi_labels, 0.0)
                         .astype(jnp.int32))
    out_assign = scatter(assignment.astype(jnp.int32))
    out_valid = jnp.arange(rois_per_image) < n_keep

    t = G.bbox_transform(out_rois[:, 1:5], gt_boxes[out_assign, :4])
    if bbox_normalize:
        t = (t - jnp.asarray(normalize_means)) / jnp.asarray(normalize_stds)
    cols = jnp.arange(4 * num_classes)
    hit = ((cols[None, :] // 4 == out_labels[:, None])
           & ((out_labels > 0) & out_valid)[:, None])
    bbox_targets = jnp.where(hit, jnp.tile(t, (1, num_classes)), 0.0)
    bbox_inside_weights = jnp.where(hit, 1.0, 0.0)
    bbox_outside_weights = (bbox_inside_weights > 0).astype(jnp.float32)
    return {"rois": out_rois, "labels": out_labels,
            "bbox_targets": bbox_targets,
            "bbox_inside_weights": bbox_inside_weights,
            "bbox_outside_weights": bbox_outside_weights,
            "valid": out_valid, "num_fg": n_fg}


def build_im_detect_2d(feat_h, feat_w, pre_nms_top_n=6000,
                       post_nms_top_n=300, compute_dtype=None,
                       n_classes=21):
    """Single-image 2D detection (lib/fast_rcnn/test.py:133-214 im_detect):
    trunk -> RPN -> proposals -> roi pool -> head -> decoded boxes."""
    from mv3d_tf_tpu.models import vggnet
    from mv3d_tf_tpu.models.mv3d import rpn_probs
    from mv3d_tf_tpu.ops.roi_pool import roi_pool

    @jax.jit
    def im_detect(params, image, im_info):
        c5 = vggnet.trunk_apply_2d(params, image[None], dtype=compute_dtype)
        cls, box = vggnet.rpn_head_2d(params, c5, dtype=compute_dtype)
        prob = rpn_probs(cls)
        rois, scores, valid = proposal_layer_2d(
            prob, box.astype(jnp.float32), im_info, feat_h, feat_w,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n)
        pooled = roi_pool(c5[0], rois, spatial_scale=1.0 / 16)
        cls_score, cls_prob, bbox_pred = vggnet.head_2d(
            params, pooled.astype(jnp.float32))
        boxes = G.bbox_transform_inv(rois[:, 1:5], bbox_pred)
        boxes = G.clip_boxes(boxes, (im_info[0], im_info[1]))
        mask = valid[:, None].astype(jnp.float32)
        return {"scores": cls_prob * mask, "boxes": boxes * mask,
                "rois": rois, "valid": valid}

    return im_detect


def compute_losses_2d(rpn_cls_score, rpn_bbox_pred, rpn_labels,
                      rpn_bbox_targets, cls_score, bbox_pred, roi_labels,
                      roi_bbox_targets, bbox_inside_weights,
                      bbox_outside_weights, roi_valid):
    """Legacy 2D 4-term loss (lib/fast_rcnn/train.py:103-199 semantics):
    RCNN box term is outside_w * smoothL1(inside_w * (pred - target))."""
    import optax

    from mv3d_tf_tpu.train import _masked_mean, smooth_l1

    logits = rpn_cls_score.reshape(-1, 2).astype(jnp.float32)
    keep = (rpn_labels != -1).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(rpn_labels, 0))
    rpn_cross_entropy = _masked_mean(ce, keep)

    pos = (rpn_labels == 1).astype(jnp.float32)
    deltas = rpn_bbox_pred.reshape(-1, 4).astype(jnp.float32)
    rpn_loss_box = _masked_mean(
        jnp.sum(smooth_l1(deltas - rpn_bbox_targets), axis=1), pos)

    rvalid = roi_valid.astype(jnp.float32)
    rce = optax.softmax_cross_entropy_with_integer_labels(
        cls_score.astype(jnp.float32), roi_labels)
    cross_entropy = _masked_mean(rce, rvalid)

    diff = bbox_inside_weights * (bbox_pred.astype(jnp.float32)
                                  - roi_bbox_targets)
    loss_box = _masked_mean(
        jnp.sum(bbox_outside_weights * smooth_l1(diff), axis=1), rvalid)

    total = cross_entropy + loss_box + rpn_cross_entropy + rpn_loss_box
    return {"loss": total, "rpn_cross_entropy": rpn_cross_entropy,
            "rpn_loss_box": rpn_loss_box, "cross_entropy": cross_entropy,
            "loss_box": loss_box}


def build_train_step_2d(feat_h, feat_w, lr=0.001, momentum=0.9,
                        stepsize=50000, gamma=0.1, rois_per_image=128,
                        pre_nms_top_n=6000, post_nms_top_n=300,
                        n_classes=21, keep_prob=0.5, compute_dtype=None,
                        bbox_normalize=True):
    """Legacy 2D train step: momentum SGD with staircase lr decay
    (train.py:103-199), conv1/conv2 frozen, bbox targets normalized by
    the precomputed stds (unnormalized back at snapshot time with
    snapshot_unnormalize_2d, train.py:44-80)."""
    import optax

    from mv3d_tf_tpu.models import vggnet
    from mv3d_tf_tpu.models.mv3d import rpn_probs
    from mv3d_tf_tpu.ops.roi_pool import roi_pool

    schedule = optax.exponential_decay(lr, stepsize, gamma, staircase=True)
    tx = optax.sgd(schedule, momentum=momentum)

    def forward(params, batch, key):
        k_anchor, k_roi, k_drop = jax.random.split(key, 3)
        c5 = vggnet.trunk_apply_2d(params, batch["image"][None],
                                   dtype=compute_dtype)
        rpn_cls, rpn_box = vggnet.rpn_head_2d(params, c5,
                                              dtype=compute_dtype)
        prob = rpn_probs(rpn_cls)
        rpn_labels, rpn_targets = anchor_target_layer_2d(
            k_anchor, batch["gt_boxes"], batch["gt_valid"],
            batch["im_info"], feat_h, feat_w)
        rois, scores, valid = proposal_layer_2d(
            jax.lax.stop_gradient(prob),
            jax.lax.stop_gradient(rpn_box.astype(jnp.float32)),
            batch["im_info"], feat_h, feat_w,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n)
        roi_data = proposal_target_layer_2d(
            k_roi, rois, valid, batch["gt_boxes"], batch["gt_valid"],
            num_classes=n_classes, rois_per_image=rois_per_image,
            bbox_normalize=bbox_normalize)
        pooled = roi_pool(c5[0], roi_data["rois"], spatial_scale=1.0 / 16)
        cls_score, _, bbox_pred = vggnet.head_2d(
            params, pooled.astype(jnp.float32), keep_prob=keep_prob,
            rng=k_drop, train=True)
        return compute_losses_2d(
            rpn_cls.astype(jnp.float32), rpn_box, rpn_labels, rpn_targets,
            cls_score, bbox_pred, roi_data["labels"],
            roi_data["bbox_targets"], roi_data["bbox_inside_weights"],
            roi_data["bbox_outside_weights"], roi_data["valid"])

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            m = forward(p, batch, key)
            return m["loss"], m
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        grads = vggnet.freeze_2d_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _optax
        params = _optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, tx


def build_fast_rcnn_train_step(n_levels, bucket_hw, lr=0.001,
                               momentum=0.9, stepsize=50000, gamma=0.1,
                               rois_per_batch=128, n_classes=21,
                               keep_prob=0.5, compute_dtype=None):
    """Fast R-CNN (no-RPN) train step over PRECOMPUTED proposals — the
    reference's `cfg.TRAIN.HAS_RPN=False` branch (lib/fast_rcnn/train.py
    with roi_data_layer/minibatch2.py blobs): image pyramid slabs in,
    host-sampled rois with pyramid-level batch indices, head-only
    CE + weighted smooth-L1 loss (no RPN terms).

    batch dict (host-padded to static shapes, see
    data/multiscale.pad_minibatch_multiscale):
      data   (n_levels, H, W, 3)  pyramid slabs (mean-subtracted BGR)
      rois   (rois_per_batch, 5)  [level_idx, x1, y1, x2, y2]
      labels (rois_per_batch,)    int32
      bbox_targets / bbox_inside_weights / bbox_outside_weights
             (rois_per_batch, 4*n_classes)
      roi_valid (rois_per_batch,) bool — padded roi slots masked out
    """
    import optax

    from mv3d_tf_tpu.models import vggnet
    from mv3d_tf_tpu.ops.roi_pool import roi_pool
    from mv3d_tf_tpu.train import _masked_mean, smooth_l1

    schedule = optax.exponential_decay(lr, stepsize, gamma, staircase=True)
    tx = optax.sgd(schedule, momentum=momentum)
    del n_levels, bucket_hw  # shapes come from the traced batch

    def forward(params, batch, key):
        c5 = vggnet.trunk_apply_2d(params, batch["data"],
                                   dtype=compute_dtype)
        pooled = roi_pool(c5, batch["rois"], spatial_scale=1.0 / 16,
                          max_in_h=batch["data"].shape[1],
                          max_in_w=batch["data"].shape[2])
        cls_score, _, bbox_pred = vggnet.head_2d(
            params, pooled.astype(jnp.float32), keep_prob=keep_prob,
            rng=key, train=True)
        rvalid = batch["roi_valid"].astype(jnp.float32)
        rce = optax.softmax_cross_entropy_with_integer_labels(
            cls_score.astype(jnp.float32), batch["labels"])
        cross_entropy = _masked_mean(rce, rvalid)
        diff = batch["bbox_inside_weights"] * (
            bbox_pred.astype(jnp.float32) - batch["bbox_targets"])
        loss_box = _masked_mean(
            jnp.sum(batch["bbox_outside_weights"] * smooth_l1(diff),
                    axis=1), rvalid)
        total = cross_entropy + loss_box
        return {"loss": total, "cross_entropy": cross_entropy,
                "loss_box": loss_box}

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            m = forward(p, batch, key)
            return m["loss"], m
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        grads = vggnet.freeze_2d_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _optax
        params = _optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, tx


def snapshot_unnormalize_2d(params, means=(0., 0., 0., 0.),
                            stds=(0.1, 0.1, 0.2, 0.2), n_classes=21):
    """Fold the bbox-target normalization back into bbox_pred weights at
    snapshot time so test-time decode needs no unnormalization
    (train.py:44-80). Returns a NEW params pytree."""
    w = np.asarray(params["bbox_pred"]["weights"])
    b = np.asarray(params["bbox_pred"]["biases"])
    # accept either per-coord (4,) stats (tiled across classes, the
    # BBOX_NORMALIZE_MEANS/STDS config form) or full per-class (4K,)
    # vectors (the add_bbox_regression_targets return form)
    means = np.asarray(means)
    stds = np.asarray(stds)
    stds_t = stds if stds.size == w.shape[1] else np.tile(stds, n_classes)
    means_t = (means if means.size == w.shape[1]
               else np.tile(means, n_classes))
    out = dict(params)
    out["bbox_pred"] = {"weights": w * stds_t[None, :],
                        "biases": b * stds_t + means_t}
    return out
