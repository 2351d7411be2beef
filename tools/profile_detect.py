#!/usr/bin/env python
"""Leave-prefix profiling of the batched int8 detect path on real TPU.

Times CUMULATIVE PREFIXES of the shipping int8 graph (each prefix is one
fused jit with explicit args reduced to a scalar, so per-dispatch tunnel
overhead is identical and XLA cannot constant-fold); successive
differences attribute milliseconds to stem / int8 trunks / proposal+NMS /
ROI pool / heads honestly — per the measurement discipline in
PROGRESS.md (standalone stage timings lie on this platform).

Usage: python tools/profile_detect.py [--batch 8] [--iters 10]
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
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import geometry as G  # noqa: F401 (parity w/ eval)
    from mv3d_tf_tpu import quant as Q
    from mv3d_tf_tpu.eval import (PIXEL_MEANS, build_detect_batch_fn)
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast
    from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD, proposal_layer_3d

    log("device:", jax.devices()[0])
    B = args.batch
    rng = np.random.RandomState(0)
    params_h = mv3d.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params_h)
    bev_h = rng.rand(B, 601, 601, 9).astype(np.float32)
    img_h = (rng.rand(B, 384, 1248, 3) * 255).astype(np.float32)
    bev = jax.device_put(bev_h)
    image = jax.device_put(img_h)
    calib_np = np.zeros((B, 4, 12), np.float32)
    calib_np[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                      0, 0, 1.0, 0.005]
    calib_np[:, 2, :9] = np.eye(3, dtype=np.float32).ravel()
    Tr = np.eye(4, dtype=np.float32)[:3]
    Tr[:, 3] = [0.0, -0.08, -0.27]
    calib_np[:, 3] = Tr.ravel()
    calib = jax.device_put(calib_np)

    qs = Q.build_quant_state(params_h, bev_h, img_h - PIXEL_MEANS)
    qstate = jax.device_put(qs)

    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    def stems(p, b, im):
        sb = Q._bf16_stem(p, b, suffix="")
        si = Q._bf16_stem(p, im.astype(jnp.float32) - PIXEL_MEANS,
                          suffix="_2")
        return sb, si

    def trunks(p, q, b, im):
        sb, si = stems(p, b, im)
        fbv, s_bv = Q.trunk_apply_int8_from_stem(q["trunk_bv"], sb)
        fim, s_im = Q.trunk_apply_int8_from_stem(q["trunk_img"], si)
        c5 = (fbv.astype(jnp.bfloat16) * s_bv).astype(jnp.bfloat16)
        c5_2 = (fim.astype(jnp.bfloat16) * s_im).astype(jnp.bfloat16)
        return c5, c5_2

    def proposals_(p, q, b, im, c):
        c5, c5_2 = trunks(p, q, b, im)
        rpn_cls, rpn_box = mv3d.rpn_head(p, c5, dtype=jnp.bfloat16)
        prob = mv3d.rpn_probs(rpn_cls)
        rois = jax.vmap(
            lambda pr, d, cc: proposal_layer_3d(
                pr[None], d[None], cc, 75, 75, pre_nms_top_n=6000,
                post_nms_top_n=300, nms_thresh=0.7, nms_impl="blocked")
        )(prob, rpn_box.astype(jnp.float32), c)
        return c5, c5_2, rois

    def pools(p, q, b, im, c):
        c5, c5_2, rois = proposals_(p, q, b, im, c)
        P = 300
        fi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
        fbv = rois["rois_bv"].reshape(B * P, 5).at[:, 0:1].set(fi)
        fim = rois["rois_img"].reshape(B * P, 5).at[:, 0:1].set(fi)
        pbv = roi_pool_fast(c5, fbv, spatial_scale=1. / 8, chunk=512,
                            rois_per_step=12)
        pim = roi_pool_fast(c5_2, fim, spatial_scale=1. / 8,
                            max_in_h=max_img_h, max_in_w=max_img_w,
                            chunk=512, rois_per_step=12)
        return pbv, pim, rois

    prefixes = {
        "P1 stems (bf16 XLA, both trunks)": jax.jit(
            lambda p, q, b, im, c: sum(
                jnp.sum(t.astype(jnp.float32)) for t in stems(p, b, im))),
        "P2 +int8 conv2-5": jax.jit(
            lambda p, q, b, im, c: sum(
                jnp.sum(t.astype(jnp.float32)) for t in trunks(p, q, b, im))),
        "P3 +rpn+proposal+nms": jax.jit(
            lambda p, q, b, im, c: (lambda r: jnp.sum(r[2]["rois_bv"]) +
                                    jnp.sum(r[2]["valid"]))(
                                        proposals_(p, q, b, im, c))),
        "P4 +dual roi pool": jax.jit(
            lambda p, q, b, im, c: (lambda r: jnp.sum(
                r[0].astype(jnp.float32)) + jnp.sum(
                r[1].astype(jnp.float32)))(pools(p, q, b, im, c))),
    }

    def timeit(fn, *a):
        out = fn(*a)
        float(np.asarray(jax.tree.leaves(out)[0], np.float32).ravel()[0])
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            float(np.asarray(jax.tree.leaves(out)[0],
                             np.float32).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    times = []
    for name, fn in prefixes.items():
        ms = timeit(fn, params, qstate, bev, image, calib)
        times.append((name, ms))
        log("{:36s} {:8.2f} ms".format(name, ms))

    detect_q = build_detect_batch_fn(compute_dtype=jnp.bfloat16, quant=qs)
    ms = timeit(lambda p, b, im, c: detect_q(p, b, im, c)["scores"],
                params, bev, image, calib)
    times.append(("P5 full int8 detect", ms))
    log("{:36s} {:8.2f} ms".format("P5 full int8 detect", ms))

    log("--- successive deltas (stage attribution) ---")
    prev = 0.0
    for name, ms in times:
        log("{:36s} {:8.2f} ms (+{:.2f})".format(name, ms, ms - prev))
        prev = ms

    # bf16 comparison: stem of the bf16 path == P1; full bf16 graph
    detect_f = build_detect_batch_fn(compute_dtype=jnp.bfloat16)
    ms = timeit(lambda p, b, im, c: detect_f(p, b, im, c)["scores"],
                params, bev, image, calib)
    log("{:36s} {:8.2f} ms".format("bf16 full detect", ms))


if __name__ == "__main__":
    main()
