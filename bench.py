#!/usr/bin/env python
"""Headline benchmark: end-to-end MV3D inference frames/sec/chip.

Runs the full single-graph detector (BEV 601x601x9 + image 384x1248x3 ->
fixed 300-slot detections) batched over EVAL_BATCH frames on one chip,
device-resident inputs, bfloat16 trunks. Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is relative to the 500 fps/chip north-star target
(BASELINE.json; the reference publishes no numbers of its own).
Auxiliary timings go to stderr.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    main_t0 = time.perf_counter()
    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu.eval import build_detect_batch_fn, build_detect_fn
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.ops import bev as bev_ops

    dev = jax.devices()[0]
    log("device:", dev)

    rng = np.random.RandomState(0)
    B = 8
    params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
    detect = build_detect_fn(compute_dtype=jnp.bfloat16)
    detect_b = build_detect_batch_fn(compute_dtype=jnp.bfloat16)

    def detect_batch(b, i, c):
        return detect_b(params, b, i, c)

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

    # NOTE: block_until_ready does not reliably block on the axon tunnel
    # platform — measurements force a SCALAR host read as the completion
    # barrier. The device executes enqueued programs serially, so
    # pipelining N calls and fetching one scalar from the LAST output
    # times steady-state device throughput without paying a tunnel RTT
    # (and without pulling whole result tensors) per iteration.
    def barrier(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    def timeit(fn, iters, reps=3):
        out = fn()
        barrier(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            barrier(out)
            ts.append((time.perf_counter() - t0) / iters)
        return min(ts)

    t0 = time.perf_counter()
    out = detect_batch(bev, image, calib)
    barrier(out["scores"])
    log("compile+first batch: {:.1f}s".format(time.perf_counter() - t0))

    dt = timeit(lambda: detect_batch(bev, image, calib)["scores"], 10)
    fps = B / dt
    log("batched detect (bf16): {:.1f} ms/batch -> {:.1f} frames/s".format(
        dt * 1000, fps))

    # aux: single-frame p50 latency (per-call barrier — true latency,
    # includes one tunnel RTT, slightly pessimistic)
    single = detect
    b1, i1, c1 = bev[0], image[0], calib[0]
    barrier(single(params, b1, i1, c1)["scores"])
    lats = []
    for _ in range(7):
        t0 = time.perf_counter()
        barrier(single(params, b1, i1, c1)["scores"])
        lats.append(time.perf_counter() - t0)
    log("single-frame p50 latency: {:.1f} ms".format(
        sorted(lats)[len(lats) // 2] * 1000))

    # aux: RPN-only stage (BASELINE.md config #3): trunks are excluded —
    # this times proposal generation + in-graph NMS on RPN outputs
    from mv3d_tf_tpu.proposals import proposal_layer_3d

    @jax.jit
    def rpn_only(prob, box, calib):
        return jax.vmap(
            lambda p, d, c: proposal_layer_3d(
                p[None], d[None], c, 75, 75, pre_nms_top_n=6000,
                post_nms_top_n=300, nms_thresh=0.7))(prob, box, calib)

    prob = jax.device_put(rng.rand(B, 75, 75, 8).astype(np.float32))
    boxd = jax.device_put(
        (rng.rand(B, 75, 75, 24).astype(np.float32) - 0.5) * 0.1)
    dt_rpn = timeit(lambda: rpn_only(prob, boxd, calib)["scores"], 10)
    log("rpn proposal+nms stage: {:.1f} ms/batch -> {:.0f} frames/s".format(
        dt_rpn * 1000, B / dt_rpn))

    # aux: end-to-end train step (BASELINE.md config #4; batch 1 per the
    # reference recipe, full 601x601 BEV + padded image)
    from mv3d_tf_tpu.train import build_train_step
    from mv3d_tf_tpu.anchors import get_anchor_grid
    from mv3d_tf_tpu import geometry as G

    step, tx = build_train_step(compute_dtype=jnp.bfloat16)
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
    batch1 = {
        "bev": bev[0], "image": image[0], "calib": calib[0],
        "gt_boxes_bv": jax.device_put(gt_bv),
        "gt_boxes_3d": jax.device_put(gt_3d),
        "gt_boxes_corners": jax.device_put(gt_cnr),
        "gt_valid": jax.device_put(gt_valid),
    }
    key = jax.random.PRNGKey(0)
    p_t, o_t, m = step(params, opt_state, batch1, key)
    barrier(m["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        p_t, o_t, m = step(p_t, o_t, batch1, key)
    barrier(m["loss"])
    dt_tr = (time.perf_counter() - t0) / iters
    log("train step (batch 1): {:.1f} ms/iter".format(dt_tr * 1000))

    # aux: BEV generation throughput (BASELINE.md config #2).
    # KITTI-realistic point distribution: ~26k of 131k points land in the
    # (0,60) x (+-30) x (-2,0.4) crop — a uniform [0,50)^3 cloud puts
    # ~0.5% of points in range and flatters the number ~2.5x.
    pts = np.zeros((B, 131072, 4), np.float32)
    pts[..., 0] = rng.rand(B, 131072) * 80 - 10
    pts[..., 1] = rng.rand(B, 131072) * 80 - 40
    pts[..., 2] = rng.rand(B, 131072) * 4 - 3
    pts[..., 3] = rng.rand(B, 131072)
    val = np.ones((B, 131072), bool)
    ptsd, vald = jax.device_put(pts), jax.device_put(val)
    dt_bev = timeit(lambda: bev_ops.point_cloud_2_top_batch(ptsd, vald), 10)
    log("bev generation: {:.0f} scans/s".format(B / dt_bev))

    # Faster-but-riskier configs (int8 trunks/head, space-to-depth stem,
    # Pallas s8 convs) run as SUBPROCESS probes: an unproven Mosaic
    # lowering must not be able to kill the headline bench, and a probe
    # that crashes the TPU worker is simply discarded. Headline takes
    # the fastest config that actually ran. Accuracy gates:
    # tools/quant_check.py + tests.
    import re
    import subprocess
    import os.path as _osp
    here = _osp.dirname(_osp.abspath(__file__))
    # r5 probe set: the knee config at its measured-best occupancy, b32
    # (209.1 fps with the shared-bins pool, ab_sharedbins_knee_b32.log;
    # the b8/16/24/32/48 sweep peaks there and b64 OOMs HBM at
    # compile), with the b16 variant (194.7 fps,
    # ab_sharedbins_knee_b16.log) as the fallback. Accuracy gate for the exact
    # knee config: tools/quant_check.py --pre-nms 1024 --nms
    # blocked_fixed (keep-set agreement + widened AP battery on the
    # trained snapshot: experiments/results/r4/prenms_knee_trained.log
    # + the r5 gate log). The list stays at 2 configs (VERDICT r4 #9:
    # probe-set growth was the main bench cold-start cost); a probe
    # that crashes or fails its NMS certificate exits non-zero and is
    # discarded.
    probes = [
        ("s2d_int8 + int8 trunks/pool/head/rpn + fixed-NMS + knee1024, "
         "b32",
         ["--int8", "--conv-impl", "xla", "--stem", "s2d_int8",
          "--int8-head", "--int8-rpn", "--nms", "blocked_fixed",
          "--pre-nms", "1024", "--batch", "32"]),
        ("s2d_int8 + int8 trunks/pool/head/rpn + fixed-NMS + knee1024, "
         "b16",
         ["--int8", "--conv-impl", "xla", "--stem", "s2d_int8",
          "--int8-head", "--int8-rpn", "--nms", "blocked_fixed",
          "--pre-nms", "1024", "--batch", "16"]),
    ]
    for name, flags in probes:
        # global budget: never let cold-cache probe compiles push the
        # whole bench past the driver's patience — the headline JSON
        # line must always get printed
        elapsed = time.perf_counter() - main_t0
        if elapsed > 1200:
            log("probe [{}] skipped (bench already {:.0f}s)".format(
                name, elapsed))
            continue
        try:
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, here + "/tools/bench_ab.py",
                 "--batch", str(B)] + flags,
                capture_output=True, text=True,
                timeout=max(300, 1500 - elapsed))
            m = re.search(r"->\s*([0-9.]+)\s*frames/s", proc.stderr)
            if proc.returncode == 0 and m:
                fps_p = float(m.group(1))
                log("probe [{}]: {:.1f} frames/s ({:.0f}s)".format(
                    name, fps_p, time.perf_counter() - t0))
                if fps_p > fps:
                    fps = fps_p
            else:
                log("probe [{}] failed rc={} (discarded): {}".format(
                    name, proc.returncode, proc.stderr[-300:]))
        except subprocess.TimeoutExpired:
            log("probe [{}] timed out (discarded)".format(name))


    print(json.dumps({
        "metric": "mv3d_e2e_inference_throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
