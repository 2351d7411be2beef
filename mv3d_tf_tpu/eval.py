"""Inference: the reference's box_detect (lib/fast_rcnn/test_mv.py:149-264)
as ONE jit-compiled XLA program per frame — BEV + image trunks, RPN,
proposal layer, dual-view ROI pooling, fusion head, corner decode — no
host round-trips; host code only does file IO and result writing.

Parity notes:
  * image mean subtraction in-graph (test_mv.py:162, PIXEL_MEANS BGR);
  * boxes for BEV NMS come from the UNREGRESSED corners
    (test_mv.py:253-261 — the "! Not apply corner regression" block);
  * the regressed corners (bbox_transform_inv_cnr) are returned alongside,
    exactly like box_detect's 4-tuple.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu import geometry as G
from mv3d_tf_tpu.config import cfg
from mv3d_tf_tpu.models import mv3d
from mv3d_tf_tpu.ops.nms import nms_np
from mv3d_tf_tpu.ops.roi_pool import roi_pool, roi_pool_fast
from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD, proposal_layer_3d

PIXEL_MEANS = np.array([95.8814, 98.7743, 93.8549], np.float32)  # config.py:211


def _fused_stem(compute_dtype):
    """Whether to use the Pallas fused conv1 stem (ops/vgg_stem_pallas.py).

    The kernel mis-lowers ONLY for narrow inputs (half-width padding to a
    single 128-lane tile, W <= 256 — bisected r2, rel 0.42 there vs bf16
    tolerance at every shipping width); vgg_stem_pallas refuses those
    shapes itself (stem_width_supported), and both detect-path widths
    (601 BEV / 1248 image) are safe. tools/tpu_selfcheck.py check 4
    guards the wide case and the narrow-refusal on every run."""
    return (jax.default_backend() != "cpu"
            and compute_dtype == jnp.bfloat16)


def build_detect_fn(feat_h=75, feat_w=75, pre_nms_top_n=6000,
                    post_nms_top_n=300, rpn_nms_thresh=0.7,
                    compute_dtype=None):
    """Build the jitted single-frame detector.

    Returns detect(params, bev, image, calib) -> dict with
      scores (P, 2), boxes_bv (P, 4*K) [from unregressed corners],
      boxes_cnr (P, 24*K), boxes_cnr_r (P, 24*K), rois_3d (P, 7),
      valid (P,);   P = post_nms_top_n, K = 2 classes.
    """
    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    @jax.jit
    def detect(params, bev, image, calib):
        image = image.astype(jnp.float32) - PIXEL_MEANS
        c5, c5_2 = mv3d.extract_features(params, bev[None], image[None],
                                         dtype=compute_dtype,
                                         fused_stem=_fused_stem(compute_dtype))
        rpn_cls, rpn_box = mv3d.rpn_head(params, c5, dtype=compute_dtype)
        prob = mv3d.rpn_probs(rpn_cls)
        rois = proposal_layer_3d(prob, rpn_box.astype(jnp.float32), calib,
                                 feat_h, feat_w,
                                 pre_nms_top_n=pre_nms_top_n,
                                 post_nms_top_n=post_nms_top_n,
                                 nms_thresh=rpn_nms_thresh)

        pooled_bv = roi_pool_fast(c5[0], rois["rois_bv"],
                                  spatial_scale=1.0 / 8,
                                  rois_per_step=12)
        pooled_img = roi_pool_fast(c5_2[0], rois["rois_img"],
                                   spatial_scale=1.0 / 8,
                                   max_in_h=max_img_h, max_in_w=max_img_w,
                                   rois_per_step=12)
        cls_score, cls_prob, bbox_pred = mv3d.fusion_head(
            params, pooled_bv, pooled_img, dtype=compute_dtype)

        boxes_3d = rois["rois_3d"][:, 1:7]
        boxes_cnr = G.lidar_3d_to_corners(boxes_3d)
        # unregressed corners duplicated per class (test_mv.py:255)
        pred_cnr = jnp.concatenate([boxes_cnr, boxes_cnr], axis=1)
        pred_cnr_r = G.bbox_transform_inv_cnr(boxes_cnr, bbox_pred)
        pred_bv = G.corners_to_bv(pred_cnr)

        mask = rois["valid"][:, None].astype(jnp.float32)
        return {
            "scores": cls_prob * mask,
            "boxes_bv": pred_bv * mask,
            "boxes_cnr": pred_cnr * mask,
            "boxes_cnr_r": pred_cnr_r * mask,
            "rois_3d": rois["rois_3d"],
            "rois_img": rois["rois_img"],
            "valid": rois["valid"],
        }

    return detect


def build_detect_batch_fn(feat_h=75, feat_w=75, pre_nms_top_n=6000,
                          post_nms_top_n=300, rpn_nms_thresh=0.7,
                          compute_dtype=None, quant=None,
                          quant_conv_impl="xla", stem_impl=None,
                          quant_rpn=False, rois_per_step=12,
                          quant_pool=True, nms_impl="auto"):
    """Natively batched multi-frame detector (throughput path).

    Trunks/RPN/fusion-head run as ONE batched computation (bigger MXU
    matmuls than vmapping the single-frame graph); only the cheap
    proposal stage is vmapped per frame; ROI pooling gathers across
    frames via the rois' batch-idx column.

    quant: optional int8 PTQ state from quant.build_quant_state — the 13
    trunk convs run s8 on the MXU with int8 intermediates (also removing
    the bf16 stem's HBM bottleneck); heads/pool stay bf16. Parity mode is
    quant=None.

    Returns detect_batch(params, bev (B,...), image (B,...),
    calib (B,4,12)) -> dict with leading dims (B, P).

    With nms_impl="blocked_fixed" the output carries "nms_converged"
    (B,) bool — the in-graph exact-greedy certificate. Callers MUST
    check it before trusting outputs on an accuracy path (solver.test_net
    raises on failure; bench_ab exits non-zero and the probe is
    discarded).
    """
    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)
    import jax.numpy as jnp

    # the int8 trunks emit bf16 features — heads must follow
    head_dtype = (jnp.bfloat16 if quant is not None else compute_dtype)

    @jax.jit
    def _detect_batch(params, qstate, bev, image, calib):
        B = bev.shape[0]
        image = image.astype(jnp.float32) - PIXEL_MEANS
        if qstate is not None:
            from mv3d_tf_tpu import quant as Q
            # int8 trunks use the XLA bf16 stem: combining the Pallas
            # stem kernel with the int8 conv chain in ONE fused graph
            # faults the TPU worker on this stack (r2 — the same stem in
            # the bf16 graph and the same int8 chain after an XLA stem
            # are both fine; axon fragility class, cf. proposals.py NMS
            # rules). Revisit if /tmp-level bisects start passing.
            fbv, s_bv, fim, s_im = Q.extract_features_int8(
                params, qstate, bev, image,
                stem=(stem_impl or "bf16"),
                conv_impl=quant_conv_impl)
            # ROI pooling reads the s8 maps directly (max commutes with
            # the monotone dequant, and the gather-bound pool moves half
            # the bytes); with quant_rpn the RPN head does too, and no
            # dequantized trunk map is materialized at all.
            # quant_pool=False dequantizes the trunk outputs instead and
            # runs the bf16 pool/head tail — the s8 pool measured no
            # faster anyway (15.53 vs 14.93 ms/batch-8, r3 stage
            # profile). The r3-era "s8 pool faults the fused graph"
            # finding was root-caused in r4 to the blocked-NMS + Pallas
            # pool coupling (fault_*.log), fixed above by fori NMS; the
            # s8 pool itself is clean.
            feat_q = (fbv, fim, s_bv, s_im)
            if not quant_pool:
                c5 = (fbv.astype(jnp.bfloat16) * s_bv).astype(jnp.bfloat16)
                c5_2 = (fim.astype(jnp.bfloat16)
                        * s_im).astype(jnp.bfloat16)
                feat_q = None
            if quant_rpn:
                rpn_cls, rpn_box = Q.rpn_head_int8(
                    params, fbv, s_bv, conv_impl=quant_conv_impl)
            else:
                c5 = (fbv.astype(jnp.bfloat16)
                      * s_bv).astype(jnp.bfloat16)
                rpn_cls, rpn_box = mv3d.rpn_head(params, c5,
                                                 dtype=head_dtype)
        else:
            feat_q = None
            si = stem_impl
            if si is None and _fused_stem(compute_dtype):
                si = "pallas"
            c5, c5_2 = mv3d.extract_features(
                params, bev, image, dtype=compute_dtype, stem_impl=si)
            rpn_cls, rpn_box = mv3d.rpn_head(params, c5,
                                             dtype=head_dtype)
        prob = mv3d.rpn_probs(rpn_cls)

        # The blocked NMS scan's data-dependent while_loops co-scheduled
        # with the Pallas pool's scalar-prefetch grid fault the TPU
        # worker (r4 bisection, experiments/results/r4/fault_*.log —
        # proposal(blocked)+Pallas-pool faults deterministically in both
        # dtypes; proposal(fori)+pool is clean). Two safe pairings:
        #   * P <= 512 (the benchmarked/YAML configs, post-NMS 300):
        #     fori NMS ("auto" picks it) + the Pallas pool. fori also
        #     measured faster standalone at this size, and matrix3 showed
        #     proposal time is overlapped with trunk MXU work anyway.
        #   * P > 512 (default-config eval, post-NMS 2000): 2000 fori
        #     steps would dominate, so keep blocked NMS but pair it with
        #     the XLA pool — the exact combination the train graph has
        #     run for 50k+ iterations without a fault.
        #   * nms_impl="blocked_fixed" (r4): the blocked formulation
        #     with fixed trip counts — no data-dependent while_loop at
        #     all, so it pairs with the Pallas pool at ANY P and keeps
        #     blocked speed; exactness is certified in-graph by the
        #     "nms_converged" output (asserted by the selfcheck/eval
        #     drivers on the shipping workload).
        if nms_impl == "blocked_fixed":
            use_pallas_pool = True
            frame_nms = "blocked_fixed"
        else:
            use_pallas_pool = post_nms_top_n <= 512
            frame_nms = "auto" if use_pallas_pool else "blocked"
        rois = jax.vmap(
            lambda p, d, c: proposal_layer_3d(
                p[None], d[None], c, feat_h, feat_w,
                pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n,
                nms_thresh=rpn_nms_thresh, nms_impl=frame_nms)
        )(prob, rpn_box.astype(jnp.float32), calib)

        P = post_nms_top_n
        frame_idx = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
        flat_bv = rois["rois_bv"].reshape(B * P, 5).at[:, 0:1].set(frame_idx)
        flat_img = rois["rois_img"].reshape(B * P, 5).at[:, 0:1].set(frame_idx)

        # rois_per_step must divide the per-frame roi count P (blocks may
        # not straddle frames): take the largest divisor of P that is
        # <= the requested block (12 divides the 300-roi test budget;
        # P=2000 picks 10)
        rt = max(d for d in range(1, max(rois_per_step, 1) + 1)
                 if P % d == 0)
        pool_src_bv, pool_src_img = (c5, c5_2) if feat_q is None else (
            feat_q[0], feat_q[1])
        if use_pallas_pool:
            _pool = lambda f, r, **kw: roi_pool_fast(  # noqa: E731
                f, r, chunk=512, rois_per_step=rt, **kw)
        else:
            _pool = lambda f, r, **kw: roi_pool(  # noqa: E731
                f, r, chunk=512, **kw)
        pooled_bv = _pool(pool_src_bv, flat_bv, spatial_scale=1.0 / 8)
        pooled_img = _pool(pool_src_img, flat_img, spatial_scale=1.0 / 8,
                           max_in_h=max_img_h, max_in_w=max_img_w)
        if feat_q is not None:
            _, _, s_bv, s_im = feat_q
            if qstate.get("head") is not None:
                # s8 pooled features feed the int8 head directly — no
                # dequant/requant round-trip
                from mv3d_tf_tpu import quant as Q
                cls_score, cls_prob, bbox_pred = Q.fusion_head_int8(
                    params, qstate["head"], pooled_bv, s_bv,
                    pooled_img, s_im)
            else:
                pooled_bv = (pooled_bv.astype(jnp.bfloat16)
                             * s_bv).astype(jnp.bfloat16)
                pooled_img = (pooled_img.astype(jnp.bfloat16)
                              * s_im).astype(jnp.bfloat16)
                cls_score, cls_prob, bbox_pred = mv3d.fusion_head(
                    params, pooled_bv, pooled_img, dtype=head_dtype)
        elif qstate is not None and qstate.get("head") is not None:
            # quant_pool=False + int8 head: the bf16 pool emitted
            # dequantized trunk values — requantize back to s8 at the
            # trunk output scale (q' = round(q*s/s): exact up to the
            # single bf16 rounding of q*s) and run the s8 head
            from mv3d_tf_tpu import quant as Q
            s_bv = qstate["trunk_bv"]["conv5_3"]["s_out"]
            s_im = qstate["trunk_img"]["conv5_3"]["s_out"]
            q_bv = jnp.clip(jnp.round(pooled_bv.astype(jnp.float32)
                                      / s_bv), 0, 127).astype(jnp.int8)
            q_im = jnp.clip(jnp.round(pooled_img.astype(jnp.float32)
                                      / s_im), 0, 127).astype(jnp.int8)
            cls_score, cls_prob, bbox_pred = Q.fusion_head_int8(
                params, qstate["head"], q_bv, s_bv, q_im, s_im)
        else:
            cls_score, cls_prob, bbox_pred = mv3d.fusion_head(
                params, pooled_bv, pooled_img, dtype=head_dtype)

        boxes_3d = rois["rois_3d"].reshape(B * P, 7)[:, 1:7]
        boxes_cnr = G.lidar_3d_to_corners(boxes_3d)
        pred_cnr = jnp.concatenate([boxes_cnr, boxes_cnr], axis=1)
        pred_cnr_r = G.bbox_transform_inv_cnr(boxes_cnr, bbox_pred)
        pred_bv = G.corners_to_bv(pred_cnr)

        valid = rois["valid"].reshape(B * P)
        mask = valid[:, None].astype(jnp.float32)
        out = {
            "scores": (cls_prob * mask).reshape(B, P, -1),
            "boxes_bv": (pred_bv * mask).reshape(B, P, -1),
            "boxes_cnr": (pred_cnr * mask).reshape(B, P, -1),
            "boxes_cnr_r": (pred_cnr_r * mask).reshape(B, P, -1),
            "rois_3d": rois["rois_3d"],
            "valid": valid.reshape(B, P),
        }
        if "nms_converged" in rois:
            out["nms_converged"] = rois["nms_converged"]   # (B,) bool
        return out

    if quant is None:
        def detect_batch(params, bev, image, calib):
            return _detect_batch(params, None, bev, image, calib)
    else:
        # the quant state rides as a runtime argument (a closure over
        # device arrays would be folded into the program as ~50 MB of
        # constants and bloat compilation)
        qstate = jax.device_put(quant)

        def detect_batch(params, bev, image, calib):
            return _detect_batch(params, qstate, bev, image, calib)

    return detect_batch


def frame_detections(det, num_classes=2, score_thresh=0.05,
                     nms_thresh=None, max_per_image=300):
    """Host-side assembly of one frame's detections per class
    (test_mv.py:415-501): threshold 0.05, BEV NMS, top-300 cap.

    Returns {cls: (dets_bv (M,5), dets_cnr (M,25), dets_cnr_r (M,25))}.
    """
    if nms_thresh is None:
        nms_thresh = cfg.TEST.NMS
    scores = np.asarray(det["scores"])
    boxes_bv = np.asarray(det["boxes_bv"])
    boxes_cnr = np.asarray(det["boxes_cnr"])
    boxes_cnr_r = np.asarray(det["boxes_cnr_r"])
    valid = np.asarray(det["valid"])

    out = {}
    all_scores = []
    for j in range(1, num_classes):
        inds = np.where(valid & (scores[:, j] > score_thresh))[0]
        cls_scores = scores[inds, j]
        cls_bv = boxes_bv[inds, j * 4:(j + 1) * 4]
        cls_cnr = boxes_cnr[inds, j * 24:(j + 1) * 24]
        cls_cnr_r = boxes_cnr_r[inds, j * 24:(j + 1) * 24]
        dets = np.hstack([cls_bv, cls_scores[:, None]]).astype(np.float32)
        keep = nms_np(dets, nms_thresh)
        out[j] = (dets[keep],
                  np.hstack([cls_cnr[keep], cls_scores[keep, None]]),
                  np.hstack([cls_cnr_r[keep], cls_scores[keep, None]]))
        all_scores.append(out[j][0][:, -1])

    # global top-N cap across classes (test_mv.py:492-501)
    if max_per_image > 0 and all_scores:
        flat = np.concatenate(all_scores)
        if len(flat) > max_per_image:
            thresh = np.sort(flat)[-max_per_image]
            for j in list(out):
                keep = np.where(out[j][0][:, -1] >= thresh)[0]
                out[j] = tuple(a[keep] for a in out[j])
    return out
