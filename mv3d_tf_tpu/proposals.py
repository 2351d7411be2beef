"""In-graph 3D proposal layer — the reference's host py_func
(lib/rpn_msr/proposal_layer_tf.py:25-202) as one jit-pure, fixed-shape
XLA stage.

Pipeline (same order as the reference):
  fg scores -> static anchor grid -> decode 6-dof deltas -> project to
  BEV + image -> clip -> min-size filter -> image-bounds filter (the
  hardcoded [375,1242]+50px pad, proposal_layer_tf.py:147,343-352) ->
  score sort / pre-NMS top-K -> greedy BEV NMS -> post-NMS top-N.

Dynamic-shape filters become score masks (filtered entries can never win
the top-K or NMS), and the output is a fixed (post_nms_top_n, ...) block
with a validity mask instead of a variable-length blob.
"""

import functools

import jax
import jax.numpy as jnp

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.anchors import get_anchor_grid
from mv3d_tf_tpu.models.mv3d import rpn_fg_scores
from mv3d_tf_tpu.ops.nms import (nms, nms_blocked, nms_blocked_fixed,
                                 top_k_by_score)

# the reference hardcodes the camera image bounds + padding rather than
# using the real image size (proposal_layer_tf.py:146-147,343-352)
IMG_BOUNDS = (375.0, 1242.0)
IMG_PAD = 50.0


@functools.partial(
    jax.jit,
    static_argnames=("feat_h", "feat_w", "feat_stride", "pre_nms_top_n",
                     "post_nms_top_n", "min_size", "im_h", "im_w",
                     "nms_impl"))
def proposal_layer_3d(rpn_cls_prob, rpn_bbox_pred, calib,
                      feat_h, feat_w, feat_stride=8,
                      pre_nms_top_n=12000, post_nms_top_n=2000,
                      nms_thresh=0.7, min_size=5, im_h=601, im_w=601,
                      im_scale=1.0, nms_impl="auto"):
    """One frame: RPN outputs -> fixed-size proposal blobs.

    Args:
      rpn_cls_prob: (1, h, w, 2A) per-anchor softmax probabilities.
      rpn_bbox_pred: (1, h, w, 6A) deltas.
      calib: (4, 12) calib blob (rows P2, P3, R0, Tr_velo2cam).
    Returns dict:
      rois_bv (P,5), rois_img (P,5), rois_3d (P,7)  [batch-idx column 0],
      scores (P,), valid (P,) with P = post_nms_top_n.
    """
    grid = get_anchor_grid(feat_h, feat_w, feat_stride, im_h, im_w)
    anchors_3d = jnp.asarray(grid.anchors_3d)

    scores = rpn_fg_scores(rpn_cls_prob)[0]                     # (K*A,)
    deltas = rpn_bbox_pred.reshape(-1, 6)                       # (K*A, 6)

    proposals_3d = G.bbox_transform_inv_3d(anchors_3d, deltas)
    proposals_bv = G.lidar_3d_to_bv(proposals_3d)
    corners = G.lidar_3d_to_corners(proposals_3d)
    proposals_img = G.lidar_cnr_to_img(corners, calib[3], calib[2], calib[0])

    proposals_bv = G.clip_boxes(proposals_bv, (im_h, im_w))

    # min-size filter (proposal_layer_tf.py:140,336-341)
    ws = proposals_bv[:, 2] - proposals_bv[:, 0] + 1.0
    hs = proposals_bv[:, 3] - proposals_bv[:, 1] + 1.0
    thr = min_size * im_scale
    keep = (ws >= thr) & (hs >= thr)

    # image-bounds filter (proposal_layer_tf.py:147,343-352)
    keep &= ((proposals_img[:, 0] >= -IMG_PAD)
             & (proposals_img[:, 2] <= IMG_BOUNDS[1] + IMG_PAD)
             & (proposals_img[:, 1] >= -IMG_PAD)
             & (proposals_img[:, 3] <= IMG_BOUNDS[0] + IMG_PAD))

    # score sort + pre-NMS top-K (proposal_layer_tf.py:161-167)
    k = min(pre_nms_top_n, scores.shape[0])
    top_idx, top_valid = top_k_by_score(scores, keep, k)
    bv = proposals_bv[top_idx]
    p3d = proposals_3d[top_idx]
    pimg = proposals_img[top_idx]
    psc = scores[top_idx]

    # greedy BEV NMS + post-NMS top-N (proposal_layer_tf.py:172-178).
    # Implementation choice (exact greedy keep set either way):
    #   * small post-NMS N (test: 300) -> fori-loop greedy `nms`:
    #     post_nms_top_n sequential O(N) steps, no N^2 mask, and no
    #     data-dependent while_loop — batched while_loops downstream of
    #     lax.top_k/gathers hard-crash the TPU worker when the program
    #     is small (see ops/nms.py), and fori also measures faster here
    #     (11 ms/batch-of-8 for the whole stage at 6000 candidates).
    #   * large post-NMS N (train: 2000) -> blocked scan `nms_blocked`:
    #     2000 sequential fori steps would dominate the train step; the
    #     blocked version resolves 512 candidates per scan step and has
    #     run 50k+ iterations inside the fused batch-1 train graph.
    # nms_impl="blocked" forces the blocked scan regardless of size.
    # r4 UPDATE: blocked NMS co-scheduled with the Pallas ROI pool in
    # one jit faults the TPU worker deterministically (any pool dtype,
    # barriers don't help — experiments/results/r4/fault_*.log). Safe
    # pairings, enforced by the callers: fori NMS + Pallas pool (batched
    # detect at post-NMS <= 512, "auto"), or blocked NMS + XLA pool (the
    # train graph at post-NMS 2000 — 50k+ iterations clean — and the
    # batched detect graph when cfg asks for post-NMS > 512).
    # nms_impl="blocked_fixed" is the blocked formulation with FIXED
    # trip counts (no data-dependent while_loop — the fault ingredient):
    # blocked speed, fori-class control flow, plus an in-graph
    # exactness certificate emitted as "nms_converged".
    converged = None
    if nms_impl == "blocked_fixed":
        keep_idx, keep_valid, converged = nms_blocked_fixed(
            bv, psc, top_valid, post_nms_top_n, nms_thresh,
            presorted=True)
    elif post_nms_top_n <= 512 and nms_impl != "blocked":
        keep_idx, keep_valid = nms(bv, psc, top_valid, post_nms_top_n,
                                   nms_thresh)
    else:
        keep_idx, keep_valid = nms_blocked(bv, psc, top_valid,
                                           post_nms_top_n, nms_thresh,
                                           presorted=True)

    zeros = jnp.zeros((post_nms_top_n, 1), jnp.float32)
    out_bv = jnp.concatenate([zeros, bv[keep_idx]], axis=1)
    out_img = jnp.concatenate([zeros, pimg[keep_idx]], axis=1)
    out_3d = jnp.concatenate([zeros, p3d[keep_idx]], axis=1)
    mask = keep_valid[:, None].astype(jnp.float32)
    out = {
        "rois_bv": out_bv * mask,
        "rois_img": out_img * mask,
        "rois_3d": out_3d * mask,
        "scores": psc[keep_idx] * keep_valid,
        "valid": keep_valid,
    }
    if converged is not None:
        out["nms_converged"] = converged
    return out
