#!/usr/bin/env python
"""Leave-one-out profiling of the batched bf16 detect graph on real TPU.

Times the FULL fused graph with exactly ONE stage replaced by a
shape-preserving near-zero-cost stand-in; (base - variant) attributes
in-context milliseconds to that stage. Timing is bench-style: N
pipelined dispatches with a single scalar host read as the barrier, so
no per-iteration tunnel RTT pollutes the numbers (per PROGRESS.md's
measurement discipline; tools/profile_detect.py's per-call barriers
inflate every number by a constant ~30 ms on this platform).

Usage: python tools/profile_loo.py [--batch 8] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default=None,
                    help="comma-separated variant-name substrings to run "
                         "(each full-graph compile is minutes over the "
                         "tunnel; run a few per invocation, the persistent "
                         "compile cache accumulates across runs)")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.eval import PIXEL_MEANS
    from mv3d_tf_tpu.models import mv3d, vgg
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast
    from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD, proposal_layer_3d

    log("device:", jax.devices()[0])
    B = args.batch
    P = 300
    rng = np.random.RandomState(0)
    params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
    bev = jax.device_put(rng.rand(B, 601, 601, 9).astype(np.float32))
    image = jax.device_put((rng.rand(B, 384, 1248, 3) * 255)
                           .astype(np.float32))
    calib_np = np.zeros((B, 4, 12), np.float32)
    calib_np[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                      0, 0, 1.0, 0.005]
    calib_np[:, 2, :9] = np.eye(3, dtype=np.float32).ravel()
    calib_np[:, 3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                      -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    calib = jax.device_put(calib_np)

    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    # fixed plausible ROIs for the no-proposal variant (grid over the
    # feature map, in input-pixel coords)
    fr = np.zeros((B * P, 5), np.float32)
    fr[:, 0] = np.repeat(np.arange(B), P)
    g = np.tile(np.arange(P), B)
    fr[:, 1] = (g % 20) * 28.0
    fr[:, 2] = (g // 20) * 36.0
    fr[:, 3] = fr[:, 1] + 120.0
    fr[:, 4] = fr[:, 2] + 96.0
    fixed_bv = jax.device_put(fr)
    fri = fr.copy()
    fri[:, 2] = (g[None] // 20).ravel() * 16.0
    fri[:, 4] = fri[:, 2] + 90.0
    fixed_img = jax.device_put(fri)

    def graph(bev, image, calib, *, stem="pallas", trunks=True,
              proposal=True, pool=True, fusion=True):
        dtype = jnp.bfloat16
        image = image.astype(jnp.float32) - PIXEL_MEANS

        def run_trunk(x, suffix):
            if stem == "pallas":
                x = vgg.trunk_apply(params, x, suffix=suffix, dtype=dtype,
                                    fused_stem=True)
                return x
            if stem == "xla":
                return vgg.trunk_apply(params, x, suffix=suffix, dtype=dtype)
            # stem == "skip": strided slice + channel pad stand-in
            h = x.shape[1] // 2 * 2
            w = x.shape[2] // 2 * 2
            s = x[:, 0:h:2, 0:w:2, :].astype(dtype)
            s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 64 - s.shape[-1])))
            if not trunks:
                return s
            for name, _, pool_after in vgg.VGG_LAYERS[2:]:
                p = params[name + suffix]
                s = vgg.conv2d(s, p["weights"], p["biases"], dtype=dtype)
                if pool_after:
                    s = vgg.max_pool_2x2_valid(s)
            return s

        if not trunks:
            # stem runs, conv2-5 replaced by slice+pad to feature shape
            def run_trunk2(x, suffix):
                y = run_trunk(x, suffix)  # stem or stand-in -> (B,H/2,W/2,64)
                y = y[:, : (y.shape[1] // 4) * 4:4, : (y.shape[2] // 4) * 4:4]
                return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 512 - 64)))
            c5 = run_trunk2(bev, "")[:, :75, :75]
            c5_2 = run_trunk2(image, "_2")
        else:
            c5 = run_trunk(bev, "")
            c5_2 = run_trunk(image, "_2")

        rpn_cls, rpn_box = mv3d.rpn_head(params, c5, dtype=dtype)
        prob = mv3d.rpn_probs(rpn_cls)

        if proposal:
            if proposal is True:
                prop_fn = lambda p, d, c: proposal_layer_3d(  # noqa: E731
                    p[None], d[None], c, 75, 75, pre_nms_top_n=6000,
                    post_nms_top_n=P, nms_thresh=0.7, nms_impl="blocked")
            else:
                # sub-variants: replicate proposal_layer_3d with exactly
                # one internal stage removed, to localize the proposal
                # stage's K-independent cost (r3: the pre-NMS knee showed
                # K 6000->512 only saves ~4.5 ms of the 14.3 ms stage)
                from mv3d_tf_tpu.anchors import get_anchor_grid
                from mv3d_tf_tpu.models.mv3d import rpn_fg_scores
                from mv3d_tf_tpu.ops.nms import nms_blocked, top_k_by_score
                grid75 = get_anchor_grid(75, 75, 8, 601, 601)
                anchors_3d = jnp.asarray(grid75.anchors_3d)
                anchors_bv = jnp.asarray(grid75.anchors_bv)
                skip = proposal

                def prop_fn(prob1, dlt, c):
                    scores = rpn_fg_scores(prob1[None])[0]
                    deltas = dlt.reshape(-1, 6)
                    if skip == "no_decode":
                        p3d = jnp.pad(anchors_3d, ((0, 0), (0, 1)))
                        pbv = anchors_bv + 0.0 * deltas[:, :4]
                        pim = pbv * 0.5
                    else:
                        p3d = G.bbox_transform_inv_3d(anchors_3d, deltas)
                        pbv = G.lidar_3d_to_bv(p3d)
                        cnr = G.lidar_3d_to_corners(p3d)
                        pim = G.lidar_cnr_to_img(cnr, c[3], c[2], c[0])
                        pbv = G.clip_boxes(pbv, (601, 601))
                    ws = pbv[:, 2] - pbv[:, 0] + 1.0
                    hs = pbv[:, 3] - pbv[:, 1] + 1.0
                    keep = (ws >= 5.0) & (hs >= 5.0)
                    keep &= ((pim[:, 0] >= -IMG_PAD)
                             & (pim[:, 2] <= IMG_BOUNDS[1] + IMG_PAD)
                             & (pim[:, 1] >= -IMG_PAD)
                             & (pim[:, 3] <= IMG_BOUNDS[0] + IMG_PAD))
                    if skip == "no_topk":
                        top_idx = jnp.arange(6000, dtype=jnp.int32)
                        top_valid = keep[:6000]
                    else:
                        top_idx, top_valid = top_k_by_score(scores, keep,
                                                            6000)
                    bv1 = pbv[top_idx]
                    psc = scores[top_idx]
                    if skip == "no_nms":
                        keep_idx = jnp.arange(P, dtype=jnp.int32)
                        keep_valid = top_valid[:P]
                    else:
                        keep_idx, keep_valid = nms_blocked(
                            bv1, psc, top_valid, P, 0.7, presorted=True)
                    zeros = jnp.zeros((P, 1), jnp.float32)
                    mask = keep_valid[:, None].astype(jnp.float32)
                    return {
                        "rois_bv": jnp.concatenate(
                            [zeros, bv1[keep_idx]], axis=1) * mask,
                        "rois_img": jnp.concatenate(
                            [zeros, pim[top_idx][keep_idx]], axis=1) * mask,
                        "rois_3d": jnp.concatenate(
                            [zeros, p3d[top_idx][keep_idx]], axis=1) * mask,
                        "scores": psc[keep_idx] * keep_valid,
                        "valid": keep_valid,
                    }
            rois = jax.vmap(prop_fn)(prob, rpn_box.astype(jnp.float32),
                                     calib)
            frame_idx = jnp.repeat(jnp.arange(B, dtype=jnp.float32),
                                   P)[:, None]
            flat_bv = (rois["rois_bv"].reshape(B * P, 5)
                       .at[:, 0:1].set(frame_idx))
            flat_img = (rois["rois_img"].reshape(B * P, 5)
                        .at[:, 0:1].set(frame_idx))
            rois_3d = rois["rois_3d"].reshape(B * P, 7)
            valid = rois["valid"].reshape(B * P)
        else:
            # keep a cheap data dependence on prob/rpn_box so RPN stays
            flat_bv = fixed_bv + 0.0 * prob[0, 0, 0, 0]
            flat_img = fixed_img + 0.0 * rpn_box[0, 0, 0, 0].astype(
                jnp.float32)
            rois_3d = jnp.zeros((B * P, 7), jnp.float32).at[:, 4:7].set(1.0)
            valid = jnp.ones((B * P,), bool)

        if pool:
            rt = 12
            pooled_bv = roi_pool_fast(c5, flat_bv, spatial_scale=1.0 / 8,
                                      chunk=512, rois_per_step=rt)
            pooled_img = roi_pool_fast(c5_2, flat_img, spatial_scale=1.0 / 8,
                                       max_in_h=max_img_h,
                                       max_in_w=max_img_w,
                                       chunk=512, rois_per_step=rt)
        else:
            # cheap stand-in keeping both trunks + rois alive
            z = (c5[:, 0, 0, :] + c5_2[:, 0, 0, :]).astype(jnp.bfloat16)
            pooled_bv = (jnp.zeros((B * P, 7, 7, 512), jnp.bfloat16)
                         + z[0][None, None, None, :]
                         + flat_bv[0, 1].astype(jnp.bfloat16))
            pooled_img = pooled_bv + flat_img[0, 1].astype(jnp.bfloat16)

        if fusion:
            cls_score, cls_prob, bbox_pred = mv3d.fusion_head(
                params, pooled_bv, pooled_img, dtype=dtype)
        else:
            s = (pooled_bv[:, 0, 0, :2] + pooled_img[:, 0, 0, :2]).astype(
                jnp.float32)
            cls_prob = jax.nn.softmax(s, axis=-1)
            bbox_pred = jnp.zeros((B * P, 48), jnp.float32)

        boxes_3d = rois_3d[:, 1:7]
        boxes_cnr = G.lidar_3d_to_corners(boxes_3d)
        pred_cnr = jnp.concatenate([boxes_cnr, boxes_cnr], axis=1)
        pred_cnr_r = G.bbox_transform_inv_cnr(boxes_cnr, bbox_pred)
        pred_bv = G.corners_to_bv(pred_cnr)
        mask = valid[:, None].astype(jnp.float32)
        return (jnp.sum(cls_prob * mask) + jnp.sum(pred_bv * mask)
                + jnp.sum(pred_cnr_r[:, 0]))

    variants = {
        "base (pallas stem)": {},
        "stem=xla": {"stem": "xla"},
        "no stem (slice)": {"stem": "skip"},
        "no conv2-5": {"trunks": False},
        "no proposal/nms": {"proposal": False},
        "prop sans nms": {"proposal": "no_nms"},
        "prop sans topk": {"proposal": "no_topk"},
        "prop sans decode": {"proposal": "no_decode"},
        "no roi pool": {"pool": False},
        "no fusion head": {"fusion": False},
        "stem only": {"trunks": False, "proposal": False, "pool": False,
                      "fusion": False},
    }

    def barrier(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    def timeit(fn):
        out = fn(bev, image, calib)
        barrier(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(bev, image, calib)
            barrier(out)
            ts.append((time.perf_counter() - t0) / args.iters)
        return min(ts) * 1000

    if args.variants:
        keys = [s.strip() for s in args.variants.split(",")]
        variants = {n: kw for n, kw in variants.items()
                    if any(k in n for k in keys)}

    results = {}
    for name, kw in variants.items():
        fn = jax.jit(lambda b, i, c, kw=kw: graph(b, i, c, **kw))
        ms = timeit(fn)
        results[name] = ms
        log("{:24s} {:8.2f} ms".format(name, ms))

    base = results.get("base (pallas stem)")
    if base is not None:
        log("--- leave-one-out attribution (ms in context of full graph)")
        for name, ms in results.items():
            if name.startswith(("no ", "stem=")):
                log("{:24s} {:+8.2f} ms vs base".format(name, ms - base))


if __name__ == "__main__":
    main()
