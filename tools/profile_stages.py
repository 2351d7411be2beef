#!/usr/bin/env python
"""Stage-level timing of the batched MV3D inference path on the real TPU.

Times each pipeline stage as its own jitted program (trunks, RPN,
proposal layer incl. NMS, dual ROI pool, fusion head + decode) plus the
full fused graph, so optimization work targets the real milliseconds.
Usage: python tools/profile_stages.py [--batch 8] [--trace DIR]
"""

import argparse
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace of the full graph here")
    ap.add_argument("--int8", action="store_true",
                    help="also profile the int8/s2d stages (stems, s8 "
                         "trunk chains xla vs pallas, s8 pool)")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu.eval import PIXEL_MEANS, build_detect_batch_fn
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast
    from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD, proposal_layer_3d
    from mv3d_tf_tpu import geometry as G

    log("device:", jax.devices()[0])
    B = args.batch
    rng = np.random.RandomState(0)
    params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
    bev = jax.device_put(rng.rand(B, 601, 601, 9).astype(np.float32))
    image = jax.device_put((rng.rand(B, 384, 1248, 3) * 255)
                           .astype(np.float32))
    calib = np.zeros((B, 4, 12), np.float32)
    calib[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                   0, 0, 1.0, 0.005]
    calib[:, 2, :9] = np.eye(3).reshape(-1)
    calib[:, 3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                   -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    calib = jax.device_put(calib)

    def barrier(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(jax.device_get(leaf.ravel()[0])))

    def bench(name, fn, *a):
        out = fn(*a)
        barrier(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            barrier(out)  # device executes serially; last-out ready = all done
            ts.append((time.perf_counter() - t0) / args.iters)
        ms = min(ts) * 1000
        log("  {:28s} {:8.2f} ms/batch   {:6.1f} fps".format(
            name, ms, B / (ms / 1e3)))
        return out, ms

    dt = jnp.bfloat16
    feat_h = feat_w = 75
    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    from mv3d_tf_tpu.eval import _fused_stem
    fused = _fused_stem(dt)

    @jax.jit
    def s_trunks(params, bev, image):
        img = image.astype(jnp.float32) - PIXEL_MEANS
        return mv3d.extract_features(params, bev, img, dtype=dt,
                                     fused_stem=fused)

    @jax.jit
    def s_bev_trunk(params, bev):
        from mv3d_tf_tpu.models import vgg
        return vgg.trunk_apply(params, bev, suffix="", dtype=dt,
                               fused_stem=fused)

    @jax.jit
    def s_img_trunk(params, image):
        from mv3d_tf_tpu.models import vgg
        img = image.astype(jnp.float32) - PIXEL_MEANS
        return vgg.trunk_apply(params, img, suffix="_2", dtype=dt,
                               fused_stem=fused)

    @jax.jit
    def s_rpn(params, c5):
        cls, box = mv3d.rpn_head(params, c5, dtype=dt)
        return mv3d.rpn_probs(cls), box.astype(jnp.float32)

    @jax.jit
    def s_proposals(prob, box, calib):
        return jax.vmap(
            lambda p, d, c: proposal_layer_3d(
                p[None], d[None], c, feat_h, feat_w,
                pre_nms_top_n=6000, post_nms_top_n=300, nms_thresh=0.7)
        )(prob, box, calib)

    @jax.jit
    def s_roipool(c5, c5_2, rois_bv, rois_img):
        P = rois_bv.shape[1]
        fi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
        fbv = rois_bv.reshape(B * P, 5).at[:, 0:1].set(fi)
        fim = rois_img.reshape(B * P, 5).at[:, 0:1].set(fi)
        p1 = roi_pool_fast(c5, fbv, spatial_scale=1.0 / 8, chunk=512)
        p2 = roi_pool_fast(c5_2, fim, spatial_scale=1.0 / 8,
                           max_in_h=max_img_h, max_in_w=max_img_w, chunk=512)
        return p1, p2

    @jax.jit
    def s_head(params, p1, p2, rois_3d):
        cls_score, cls_prob, bbox_pred = mv3d.fusion_head(
            params, p1, p2, dtype=dt)
        boxes_3d = rois_3d.reshape(-1, 7)[:, 1:7]
        cnr = G.lidar_3d_to_corners(boxes_3d)
        pred_cnr_r = G.bbox_transform_inv_cnr(cnr, bbox_pred)
        return cls_prob, pred_cnr_r, G.corners_to_bv(
            jnp.concatenate([cnr, cnr], 1))

    log("== stages (batch {}) ==".format(B))
    (c5, c5_2), t_tr = bench("trunks (both)", s_trunks, params, bev, image)
    bench("  bev trunk only", s_bev_trunk, params, bev)
    bench("  img trunk only", s_img_trunk, params, image)
    (prob, box), t_rpn = bench("rpn head+probs", s_rpn, params, c5)
    rois, t_prop = bench("proposal layer (vmap+NMS)", s_proposals,
                         prob, box, calib)
    (p1, p2), t_pool = bench("roi pool x2", s_roipool,
                             c5, c5_2, rois["rois_bv"], rois["rois_img"])
    _, t_head = bench("fusion head + decode", s_head,
                      params, p1, p2, rois["rois_3d"])
    log("  {:28s} {:8.2f} ms/batch (sum)".format(
        "stage sum", t_tr + t_rpn + t_prop + t_pool + t_head))

    if args.int8:
        from mv3d_tf_tpu import quant as Q
        from mv3d_tf_tpu.ops.stem_s2d import stem_s2d
        img_ms = np.asarray(image) - PIXEL_MEANS
        qs = jax.device_put(Q.build_quant_state(
            params, np.asarray(bev), img_ms))

        @jax.jit
        def s_stem_bf16(params, bev, image):
            img = image.astype(jnp.float32) - PIXEL_MEANS
            return (Q._bf16_stem(params, bev, suffix=""),
                    Q._bf16_stem(params, img, suffix="_2"))

        @jax.jit
        def s_stem_s2d(params, bev, image):
            img = image.astype(jnp.float32) - PIXEL_MEANS
            p1, p2 = params["conv1_1"], params["conv1_2"]
            a = stem_s2d(bev, p1["weights"], p1["biases"],
                         p2["weights"], p2["biases"], dtype=dt)
            p1, p2 = params["conv1_1_2"], params["conv1_2_2"]
            b = stem_s2d(img, p1["weights"], p1["biases"],
                         p2["weights"], p2["biases"], dtype=dt)
            return a, b

        def mk_trunks_q(conv_impl):
            @jax.jit
            def f(qs, sb, si):
                a, _ = Q.trunk_apply_int8_from_stem(
                    qs["trunk_bv"], sb, conv_impl=conv_impl)
                b, _ = Q.trunk_apply_int8_from_stem(
                    qs["trunk_img"], si, conv_impl=conv_impl)
                return a, b
            return f

        def mk_extract(stem, conv_impl):
            @jax.jit
            def f(params, qs, bev, image):
                img = image.astype(jnp.float32) - PIXEL_MEANS
                return Q.extract_features_int8(params, qs, bev, img,
                                               stem=stem,
                                               conv_impl=conv_impl)
            return f

        @jax.jit
        def s_stem_s2d_fused(params, bev, image):
            from mv3d_tf_tpu.ops.stem_s2d_pallas import stem_s2d_fused
            img = image.astype(jnp.float32) - PIXEL_MEANS
            p1, p2 = params["conv1_1"], params["conv1_2"]
            a = stem_s2d_fused(bev, p1["weights"], p1["biases"],
                               p2["weights"], p2["biases"], dtype=dt)
            p1, p2 = params["conv1_1_2"], params["conv1_2_2"]
            b = stem_s2d_fused(img, p1["weights"], p1["biases"],
                               p2["weights"], p2["biases"], dtype=dt)
            return a, b

        log("== int8 / s2d stages ==")
        (sb, si), _ = bench("stem bf16 (both views)", s_stem_bf16,
                            params, bev, image)
        bench("stem s2d bf16 (both views)", s_stem_s2d, params, bev,
              image)
        bench("stem s2d FUSED (both views)", s_stem_s2d_fused, params,
              bev, image)
        bench("int8 trunks from stem (xla)", mk_trunks_q("xla"),
              qs, sb, si)
        bench("int8 trunks from stem (pallas)", mk_trunks_q("pallas"),
              qs, sb, si)
        (fbv, _, fim, _), _ = bench(
            "int8 extract (s2d_int8+pallas)",
            mk_extract("s2d_int8", "pallas"), params, qs, bev, image)
        bench("roi pool x2 on s8 features", s_roipool,
              fbv, fim, rois["rois_bv"], rois["rois_img"])

    detect_b = build_detect_batch_fn(compute_dtype=dt)
    full = lambda b, i, c: detect_b(params, b, i, c)
    _, t_full = bench("FULL fused graph", full, bev, image, calib)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                barrier(full(bev, image, calib))
        log("trace written to", args.trace)


if __name__ == "__main__":
    main()
