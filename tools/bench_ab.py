#!/usr/bin/env python
"""A/B bench of the SHIPPING batched detector under simple toggles:
  --stem {pallas,xla}   fused Pallas stem vs plain XLA convs
  --batch N             frames per dispatch
Uses exactly eval.build_detect_batch_fn (no rebuilt graph, so compile
risk and fusion behavior match production), bench.py-style pipelined
timing. One toggle per invocation keeps remote-compile exposure small.
"""

import argparse
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="frames per dispatch (default: 8 for detect, "
                         "1 for --train — the reference recipe is "
                         "batch-1, train_mv.py:159-183)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stem", default="pallas",
                    choices=["pallas", "xla", "s2d", "s2d_fused",
                             "s2d_int8"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-head", action="store_true",
                    help="also quantize the fusion head (fc6/fc7)")
    ap.add_argument("--int8-rpn", action="store_true",
                    help="also quantize the RPN 3x3 conv")
    ap.add_argument("--conv-impl", default="xla",
                    choices=["xla", "pallas", "hybrid", "dots", "im2col"],
                    help="int8 trunk conv implementation")
    ap.add_argument("--train", action="store_true",
                    help="time the train step instead of the detector")
    ap.add_argument("--rois-per-step", type=int, default=12,
                    help="Pallas ROI-pool roi block size (divisor of "
                         "post_nms_top_n=300)")
    ap.add_argument("--pool-cwin", type=int, default=None,
                    help="Pallas ROI-pool column-bin window width "
                         "(multiple of 8; default 16, 8 halves the "
                         "masked reduce work for typical 1-3 cell bins)")
    ap.add_argument("--pool-bins", default=None,
                    choices=["shared", "window"],
                    help="Pallas ROI-pool column-bin stage: shared = one "
                         "RWIN window feeds all 7 bins (r5 default); "
                         "window = per-bin CWIN windows (r4)")
    ap.add_argument("--pre-nms", type=int, default=None,
                    help="pre-NMS top-K (defaults: detect 6000 / train "
                         "12000, the reference cfg budgets; the recall "
                         "knee lives much lower — tools/prenms_knee.py)")
    ap.add_argument("--nms", default="auto",
                    choices=["auto", "blocked_fixed"],
                    help="proposal NMS inside the batched detect graph: "
                         "auto = fori (P<=512) / blocked+XLA-pool; "
                         "blocked_fixed = fixed-trip blocked scan + "
                         "Pallas pool (fault-safe, r4)")
    ap.add_argument("--no-quant-pool", action="store_true",
                    help="int8 graphs: dequantize trunk features and run "
                         "the bf16 pool/head path (measured same pool "
                         "speed; dodges the s8-pool fused-graph fault)")
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 1 if args.train else 8

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import eval as E

    log("device:", jax.devices()[0], "stem:", args.stem,
        "batch:", args.batch, "int8:", args.int8)
    if args.pool_cwin is not None:
        from mv3d_tf_tpu.ops import roi_pool_pallas as _rpp
        _rpp._CWIN = args.pool_cwin
        log("pool CWIN:", args.pool_cwin)
    if args.pool_bins is not None:
        from mv3d_tf_tpu.ops import roi_pool_pallas as _rpp
        _rpp._SHARED_BINS = args.pool_bins == "shared"
        log("pool bins:", args.pool_bins)
    stem_impl = None
    if args.stem == "xla":
        E._fused_stem = lambda dtype: False
        stem_impl = "bf16" if args.int8 else None
    elif args.stem in ("s2d", "s2d_fused", "s2d_int8"):
        stem_impl = args.stem

    B = args.batch
    rng = np.random.RandomState(0)
    from mv3d_tf_tpu.models import mv3d
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

    if args.train:
        _bench_train(args, jax, jnp, np, params, bev, image, calib,
                     stem_impl if args.stem == "s2d" else None)
        return

    quant = None
    if args.int8:
        from mv3d_tf_tpu import quant as Q
        # calibrate on a FIXED 4-frame slice, not the full bench batch:
        # the B-shaped calibration graphs dominated probe wall time
        # (~14 min/process at b32, measured — detect itself cache-hits
        # in seconds) and changed HLO with every batch size. A fixed
        # slice gives one cached calibration compile and batch-invariant
        # scales; accuracy gating calibrates separately on real frames
        # (tools/quant_check.py --calib_frames).
        nc = min(4, args.batch)
        img_ms = np.asarray(image)[:nc] - E.PIXEL_MEANS
        bev_c = np.asarray(bev)[:nc]
        pool_bv = pool_img = None
        if args.int8_head:
            pool_bv, pool_img = Q.calibrate_pooled_features(
                params, bev_c, img_ms, np.asarray(calib)[:nc])
        quant = Q.build_quant_state(params, bev_c, img_ms,
                                    pooled_bv=pool_bv,
                                    pooled_img=pool_img)
    detect = E.build_detect_batch_fn(compute_dtype=jnp.bfloat16,
                                     quant=quant,
                                     quant_conv_impl=args.conv_impl,
                                     stem_impl=stem_impl,
                                     quant_rpn=args.int8_rpn,
                                     rois_per_step=args.rois_per_step,
                                     pre_nms_top_n=(args.pre_nms
                                                    if args.pre_nms
                                                    else 6000),
                                     quant_pool=not args.no_quant_pool,
                                     nms_impl=args.nms)

    def barrier(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    t0 = time.perf_counter()
    out = detect(params, bev, image, calib)
    barrier(out["scores"])
    log("compile+first: {:.1f}s".format(time.perf_counter() - t0))

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = detect(params, bev, image, calib)
        barrier(out["scores"])
        ts.append((time.perf_counter() - t0) / args.iters)
    dt = min(ts)
    log("detect: {:.1f} ms/batch -> {:.2f} frames/s".format(
        dt * 1000, B / dt))
    if "nms_converged" in out:
        conv = np.asarray(jax.device_get(out["nms_converged"]))
        log("nms_converged: {}/{} frames (exact-greedy certificate)"
            .format(int(conv.sum()), conv.size))
        if int(conv.sum()) < conv.size:
            # A non-converged frame means blocked_fixed's fixed trip
            # count did not reach the exact greedy keep set — the fps
            # number above must not ship. Non-zero exit makes bench.py
            # discard this probe (ADVICE r4).
            log("WARNING: NMS certificate FAILED on {} frame(s); "
                "result discarded".format(conv.size - int(conv.sum())))
            sys.exit(3)


def _bench_train(args, jax, jnp, np, params, bev, image, calib,
                 stem_impl):
    """Train-step timing under the stem toggle (bench.py's batch-1
    recipe shapes)."""
    import time

    from mv3d_tf_tpu import geometry as G
    from mv3d_tf_tpu.anchors import get_anchor_grid
    from mv3d_tf_tpu.train import build_train_step

    # train-graph levers (VERDICT r4 #4): --nms blocked_fixed swaps the
    # post-NMS-2000 blocked scan for the fixed-trip version; --pre-nms
    # cuts the 12000 train budget (accuracy gate: a trajectory segment
    # via tools/accuracy_eval.py before shipping any knee).
    tr_kwargs = dict(compute_dtype=jnp.bfloat16, stem_impl=stem_impl,
                     nms_impl=args.nms)
    if args.pre_nms is not None:
        tr_kwargs["pre_nms_top_n"] = args.pre_nms
    step, tx = build_train_step(**tr_kwargs)
    if args.batch > 1:
        # single-chip throughput-mode training: vmap the per-frame
        # forward+loss over a batch, average, one optimizer update
        # (the reference recipe is batch 1; this measures the
        # batch>1 variant, VERDICT r1 #9)
        import functools
        import optax
        from mv3d_tf_tpu.train import build_forward_losses
        fwd_kwargs = dict(tr_kwargs)
        fwd_kwargs.pop("lr", None)
        fwd = build_forward_losses(pool_impl="xla", roi_chunk=32,
                                   **fwd_kwargs)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch, key):  # noqa: F811
            keys = jax.random.split(key, args.batch)

            def loss_fn(p):
                m = jax.vmap(lambda b, k: fwd(p, b, k),
                             in_axes=(0, 0))(batch, keys)
                m = jax.tree.map(lambda a: jnp.mean(a), m)
                return m["loss"], m
            grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics
    opt_state = tx.init(params)
    grid = get_anchor_grid(75, 75)
    inside = np.where(grid.inside)[0]
    max_gt = 8
    gt_bv = np.zeros((max_gt, 5), np.float32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_3d = np.zeros((max_gt, 7), np.float32)
    gt_3d[:, 3:6] = 1.0
    gt_cnr = np.zeros((max_gt, 25), np.float32)
    for g in range(4):
        a = inside[(g * 211 + 40) % len(inside)]
        gt_bv[g, :4] = grid.anchors_bv[a]
        gt_bv[g, 4] = 1.0
        gt_valid[g] = True
        gt_3d[g, :6] = np.asarray(G.bv_anchor_to_lidar(
            gt_bv[g:g + 1, :4]))[0]
        gt_3d[g, 6] = 1.0
        gt_cnr[g, :24] = np.asarray(G.lidar_3d_to_corners(
            gt_3d[g:g + 1, :6]))[0]
        gt_cnr[g, 24] = 1.0
    if args.batch > 1:
        nb = args.batch
        rep = lambda a: jax.device_put(  # noqa: E731
            np.broadcast_to(np.asarray(a), (nb,) + np.asarray(a).shape
                            ).copy())
        batch1 = {
            "bev": bev[:nb] if bev.shape[0] >= nb else rep(bev[0]),
            "image": (image[:nb] if image.shape[0] >= nb
                      else rep(image[0])),
            "calib": (calib[:nb] if calib.shape[0] >= nb
                      else rep(calib[0])),
            "gt_boxes_bv": rep(gt_bv),
            "gt_boxes_3d": rep(gt_3d),
            "gt_boxes_corners": rep(gt_cnr),
            "gt_valid": rep(gt_valid),
        }
    else:
        batch1 = {
            "bev": bev[0], "image": image[0], "calib": calib[0],
            "gt_boxes_bv": jax.device_put(gt_bv),
            "gt_boxes_3d": jax.device_put(gt_3d),
            "gt_boxes_corners": jax.device_put(gt_cnr),
            "gt_valid": jax.device_put(gt_valid),
        }
    key = jax.random.PRNGKey(0)

    def barrier(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    t0 = time.perf_counter()
    p_t, o_t, m = step(params, opt_state, batch1, key)
    barrier(m["loss"])
    log("compile+first: {:.1f}s".format(time.perf_counter() - t0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p_t, o_t, m = step(p_t, o_t, batch1, key)
        barrier(m["loss"])
        ts.append((time.perf_counter() - t0) / args.iters)
    dt = min(ts)
    log("train step: {:.1f} ms/iter, {:.1f} frames/s (batch={}, stem={})"
        .format(dt * 1000, args.batch / dt, args.batch,
                stem_impl or "literal"))


if __name__ == "__main__":
    main()
