"""Training target layers — the reference's anchor_target_layer and
proposal_target_layer_3d host py_funcs (lib/rpn_msr/anchor_target_layer_tf.py,
proposal_target_layer_tf.py) as jit-pure, fixed-shape stages with
jax.random sampling instead of npr.choice.

Ground truth arrives as fixed (MAX_GT, ...) blocks with a validity mask.
Sampling without replacement is expressed as random-priority ranking,
which matches npr.choice's distribution (not its bit stream — inference
is the bit-parity surface; training parity is distributional, SURVEY §7.3).

anchor_target_layer parity notes (the reference applies several passes
whose FINAL state is, anchor_target_layer_tf.py:125-183:
  fg = {IoU >= 0.7} ∪ {best-anchor-per-gt with IoU >= 0.5}, subsampled
       to 32 (disabled fg stay ignored);
  bg = random sample of {IoU < 0.5} (including zero overlap) of size
       128 - #fg;  everything else ignored (-1).
The best-anchor-per-gt positives with IoU < 0.5 are RESET to background
by the late labels[max_overlaps < NEG] = 0 pass (:176) — replicated.)
"""

import functools

import jax
import jax.numpy as jnp

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.anchors import get_anchor_grid
from mv3d_tf_tpu.ops.iou import bbox_overlaps

NEG_BIG = jnp.float32(-1e30)


def _sample_mask(key, candidates, k):
    """Random subset of exactly min(k, #candidates) True entries.

    Equivalent in distribution to npr.choice(inds, size=..., replace=False).
    k may be a traced scalar.
    """
    n = candidates.shape[0]
    pri = jnp.where(candidates, jax.random.uniform(key, (n,)), NEG_BIG)
    # rank by descending priority; positions < k among candidates win
    order = jnp.argsort(-pri)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return candidates & (rank < k)


@functools.partial(jax.jit, static_argnames=("feat_h", "feat_w", "feat_stride",
                                             "im_h", "im_w", "rpn_batch"))
def anchor_target_layer(key, gt_boxes_bv, gt_valid, gt_boxes_3d,
                        feat_h, feat_w, feat_stride=8, im_h=601, im_w=601,
                        rpn_batch=128, fg_fraction=0.25,
                        pos_overlap=0.7, neg_overlap=0.5):
    """RPN training targets over the full (K*A,) anchor grid.

    Args:
      key: PRNG key for fg/bg subsampling.
      gt_boxes_bv: (MAX_GT, 5) [x1,y1,x2,y2,cls]; gt_valid: (MAX_GT,) bool.
      gt_boxes_3d: (MAX_GT, 7) [x,y,z,l,w,h,cls].
    Returns:
      labels (total,) int32 in {-1,0,1}; bbox_targets (total,6) f32
      (zero outside the inside-image anchor set, like _unmap fill=0).
    """
    grid = get_anchor_grid(feat_h, feat_w, feat_stride, im_h, im_w)
    anchors_bv = jnp.asarray(grid.anchors_bv)
    anchors_3d = jnp.asarray(grid.anchors_3d)
    inside = jnp.asarray(grid.inside)
    total = grid.total

    overlaps = bbox_overlaps(anchors_bv, gt_boxes_bv[:, :4])   # (total, MAX_GT)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    argmax_overlaps = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.max(overlaps, axis=1)
    max_overlaps = jnp.maximum(max_overlaps, 0.0)   # all-invalid-gt guard

    # per-gt max over INSIDE anchors (the reference computes overlaps on
    # inside anchors only, :115-123)
    ovl_inside = jnp.where(inside[:, None], overlaps, -1.0)
    gt_max = jnp.max(ovl_inside, axis=0)                       # (MAX_GT,)
    is_gt_best = jnp.any((ovl_inside == gt_max[None, :]) & gt_valid[None, :],
                         axis=1)

    # exact final-state flow of anchor_target_layer_tf.py:125-183:
    # the 32-quota sample draws from the FIRST-round positive pool
    # (gt-best at any IoU, or IoU >= 0.7); the late labels[ovr<NEG]=0
    # pass (:176) then demotes every selected-or-not anchor with
    # IoU < 0.5 to background candidacy.
    fg_pool = inside & (is_gt_best | (max_overlaps >= pos_overlap))
    num_fg_quota = int(fg_fraction * rpn_batch)
    k_fg, k_bg = jax.random.split(key)
    fg_sel = (_sample_mask(k_fg, fg_pool, num_fg_quota)
              & (max_overlaps >= neg_overlap))
    n_fg = jnp.sum(fg_sel)

    # bg candidates: IoU < neg (including zero overlap and demoted fg)
    bg_cand = inside & (max_overlaps < neg_overlap)
    bg_sel = _sample_mask(k_bg, bg_cand, rpn_batch - n_fg)

    labels = jnp.full((total,), -1, jnp.int32)
    labels = jnp.where(bg_sel, 0, labels)
    labels = jnp.where(fg_sel, 1, labels)

    # 6-dof targets vs the argmax gt for every inside anchor, 0 elsewhere.
    # The gt row lookup is a where-chain over the MAX_GT(=8) rows, NOT
    # gt_boxes_3d[argmax_overlaps]: XLA:TPU lowers that (22500,)-index
    # gather of (8,7) rows to a SERIAL 22500-trip while loop of
    # dynamic-slices — ~47 ms of the ~82 ms train step (trace_train,
    # while.21/dynamic-slice.81 at this source line). The select chain
    # is 8 vectorized compares, bit-identical output.
    gt6 = gt_boxes_3d[:, :6]
    picked = jnp.broadcast_to(gt6[0], (argmax_overlaps.shape[0], 6))
    for g in range(1, gt6.shape[0]):
        picked = jnp.where((argmax_overlaps == g)[:, None], gt6[g], picked)
    tgt = G.bbox_transform_3d(anchors_3d, picked)
    bbox_targets = jnp.where(inside[:, None], tgt, 0.0)
    return labels, bbox_targets


@functools.partial(jax.jit, static_argnames=("num_classes", "rois_per_image"))
def proposal_target_layer_3d(key, rois_bv, rois_3d, rois_valid,
                             gt_boxes_bv, gt_valid, gt_boxes_3d,
                             gt_boxes_corners, calib,
                             num_classes=2, rois_per_image=128,
                             fg_fraction=0.25, fg_thresh=0.5,
                             bg_thresh_hi=0.5, bg_thresh_lo=0.1):
    """Sample RPN proposals into a fixed RCNN minibatch with corner targets.

    proposal_target_layer_tf.py:19-94 + _sample_rois_3d (:227-298).

    Args:
      rois_bv (P,5)/rois_3d (P,7)/rois_valid (P,): proposal blobs.
      gt_*: (MAX_GT, ...) padded ground truth + validity.
      calib: (4,12).
    Returns dict with fixed leading dim N=rois_per_image:
      rois_bv (N,5), rois_img (N,5), rois_3d (N,7), labels (N,) int32,
      bbox_targets (N, 24*num_classes), valid (N,) bool.
    """
    # include gt boxes in the candidate set (:38-44)
    gt_as_roi_bv = jnp.concatenate(
        [jnp.zeros((gt_boxes_bv.shape[0], 1)), gt_boxes_bv[:, :4]], axis=1)
    gt_as_roi_3d = jnp.concatenate(
        [jnp.zeros((gt_boxes_3d.shape[0], 1)), gt_boxes_3d[:, :6]], axis=1)
    all_bv = jnp.concatenate([rois_bv, gt_as_roi_bv], axis=0)
    all_3d = jnp.concatenate([rois_3d, gt_as_roi_3d], axis=0)
    all_valid = jnp.concatenate([rois_valid, gt_valid], axis=0)
    n_all = all_bv.shape[0]

    overlaps = bbox_overlaps(all_bv[:, 1:5], gt_boxes_bv[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    gt_assignment = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.maximum(jnp.max(overlaps, axis=1), 0.0)
    roi_labels = gt_boxes_bv[gt_assignment, 4]

    fg_quota = int(round(fg_fraction * rois_per_image))
    k_fg, k_bg = jax.random.split(key)
    fg_cand = all_valid & (max_overlaps >= fg_thresh)
    fg_sel = _sample_mask(k_fg, fg_cand, fg_quota)
    n_fg = jnp.sum(fg_sel)
    bg_cand = (all_valid & (max_overlaps < bg_thresh_hi)
               & (max_overlaps >= bg_thresh_lo))
    bg_sel = _sample_mask(k_bg, bg_cand, rois_per_image - n_fg)
    n_bg = jnp.sum(bg_sel)

    # pack: fg rows first, then bg (keep_inds order, :272-276)
    pri_fg = jnp.where(fg_sel, jax.random.uniform(k_fg, (n_all,)), NEG_BIG)
    rank_fg = jnp.zeros((n_all,), jnp.int32).at[jnp.argsort(-pri_fg)].set(
        jnp.arange(n_all, dtype=jnp.int32))
    pri_bg = jnp.where(bg_sel, jax.random.uniform(k_bg, (n_all,)), NEG_BIG)
    rank_bg = jnp.zeros((n_all,), jnp.int32).at[jnp.argsort(-pri_bg)].set(
        jnp.arange(n_all, dtype=jnp.int32))
    slot = jnp.where(fg_sel, rank_fg,
                     jnp.where(bg_sel, n_fg + rank_bg, rois_per_image))
    slot = jnp.minimum(slot, rois_per_image)      # dump slot for unselected

    def scatter(x, fill=0.0):
        shape = (rois_per_image + 1,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[slot].set(x)[:rois_per_image]

    out_bv = scatter(all_bv)
    out_3d = scatter(all_3d)
    sel_labels = jnp.where(fg_sel, roi_labels, 0.0)  # bg clamped to 0 (:276)
    out_labels = scatter(sel_labels.astype(jnp.int32))
    out_assign = scatter(gt_assignment.astype(jnp.int32))
    n_keep = n_fg + n_bg
    out_valid = jnp.arange(rois_per_image) < n_keep

    # corners of the sampled rois (:283-284)
    rois_cnr = G.lidar_3d_to_corners(out_3d[:, 1:7])
    gt_cnr = gt_boxes_corners[out_assign, :24]
    # corner targets normalized by GT diagonal (:293-296); guard padded rows
    diag = G.corner_diag(gt_cnr)
    safe_diag = jnp.where(diag > 0, diag, 1.0)
    tgt = (gt_cnr - rois_cnr) / safe_diag[:, None]
    # expand to one-class-hot (N, 24*K): only fg rows, their class block
    cols = jnp.arange(24 * num_classes)
    cls_block = cols[None, :] // 24                      # (1, 24K)
    is_fg_row = (out_labels > 0) & out_valid
    block_hit = (cls_block == out_labels[:, None]) & is_fg_row[:, None]
    bbox_targets = jnp.where(
        block_hit, jnp.tile(tgt, (1, num_classes)), 0.0)

    # project sampled rois to the image view (:74-76)
    rois_img = G.lidar_cnr_to_img(rois_cnr, calib[3], calib[2], calib[0])
    out_img = jnp.concatenate([out_bv[:, :1], rois_img], axis=1)

    vmask = out_valid[:, None].astype(jnp.float32)
    return {
        "rois_bv": out_bv * vmask,
        "rois_img": out_img * vmask,
        "rois_3d": out_3d * vmask,
        "labels": out_labels * out_valid,
        "bbox_targets": bbox_targets,
        "valid": out_valid,
        "num_fg": n_fg,
    }
