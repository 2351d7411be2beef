#!/usr/bin/env python
"""jax.profiler trace of the FUSED headline detect graph + top-op table
(VERDICT r3 #4: attribute the batch-8 graph's milliseconds by direct
observation, not standalone-stage subtraction).

Builds exactly eval.build_detect_batch_fn with the headline flags, warms
it, traces N steps with create_perfetto_trace=True, then parses the
perfetto trace.json.gz (plain JSON, no tensorboard needed) and prints
the top ops by total device time. The reference hot path being
attributed is lib/fast_rcnn/test_mv.py:186-197 (the one sess.run).

Usage:
  python tools/trace_detect.py --stem s2d_int8 --int8 --batch 8 \
      --out /tmp/trace_int8
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_perfetto(trace_dir, top=25, steps=1):
    """Aggregate complete events by name across device tracks."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        log("no trace.json.gz found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    log("parsing", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # pid/tid -> names from metadata events
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread_names[(e["pid"], e.get("tid"))] = (
                    e["args"].get("name", ""))
    by_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_names.get(e.get("pid"), "")
        tname = thread_names.get((e.get("pid"), e.get("tid")), "")
        # keep device-side XLA op lanes; drop host python/runtime lanes
        blob = (pname + " " + tname).lower()
        if not ("tpu" in blob or "xla" in blob or "device" in blob):
            continue
        if "steps" in tname.lower() or "framework" in blob:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        by_name[name] += dur
        counts[name] += 1
        total += dur
    log("\ndevice total: {:.2f} ms over {} steps "
        "({:.2f} ms/step)".format(total / 1e3, steps, total / 1e3 / steps))
    log("{:<64s} {:>9s} {:>7s} {:>6s}".format(
        "op", "ms/step", "%", "calls"))
    for name, dur in by_name.most_common(top):
        log("{:<64s} {:9.3f} {:6.1f}% {:6d}".format(
            name[:64], dur / 1e3 / steps, 100.0 * dur / max(total, 1e-9),
            counts[name]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--stem", default="s2d_int8")
    ap.add_argument("--int8", action="store_true", default=True)
    ap.add_argument("--int8-head", action="store_true")
    ap.add_argument("--int8-rpn", action="store_true")
    ap.add_argument("--pre-nms", type=int, default=None,
                    help="pre-NMS top-K (default 6000; the headline "
                         "knee config runs 1024)")
    ap.add_argument("--rois-per-step", type=int, default=12)
    ap.add_argument("--nms", default="auto",
                    choices=["auto", "blocked_fixed"])
    ap.add_argument("--out", default="/tmp/trace_detect")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse-only", action="store_true",
                    help="just re-parse an existing trace dir")
    args = ap.parse_args()

    if args.parse_only:
        parse_perfetto(args.out, top=args.top, steps=args.steps)
        return

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    from mv3d_tf_tpu import quant as Q
    from mv3d_tf_tpu.eval import build_detect_batch_fn
    from mv3d_tf_tpu.models import mv3d

    log("device:", jax.devices()[0], "stem:", args.stem,
        "batch:", args.batch)
    B = args.batch
    rng = np.random.RandomState(0)
    params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
    bev_h = rng.rand(B, 601, 601, 9).astype(np.float32)
    img_h = (rng.rand(B, 384, 1248, 3) * 255).astype(np.float32)
    bev = jax.device_put(bev_h)
    image = jax.device_put(img_h)
    calib = np.zeros((B, 4, 12), np.float32)
    calib[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                   0, 0, 1.0, 0.005]
    calib[:, 2, :9] = np.eye(3).reshape(-1)
    calib[:, 3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                   -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    calib = jax.device_put(calib)

    from mv3d_tf_tpu.eval import PIXEL_MEANS
    qstate = None
    if args.int8:
        img_ms = img_h - PIXEL_MEANS
        pool_bv = pool_img = None
        if args.int8_head:
            pool_bv, pool_img = Q.calibrate_pooled_features(
                params, bev_h, img_ms, np.asarray(jax.device_get(calib)))
        qstate = Q.build_quant_state(params, bev_h[:2], img_ms[:2],
                                     pooled_bv=pool_bv,
                                     pooled_img=pool_img)
    detect = build_detect_batch_fn(
        quant=qstate, stem_impl=args.stem,
        rois_per_step=args.rois_per_step, nms_impl=args.nms,
        quant_rpn=args.int8_rpn,
        pre_nms_top_n=(args.pre_nms if args.pre_nms else 6000))

    def run():
        out = detect(params, bev, image, calib)
        jax.block_until_ready(out["scores"])
        return out

    t0 = time.perf_counter()
    run()
    log("compile+first: {:.1f}s".format(time.perf_counter() - t0))
    for _ in range(3):
        run()

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out, create_perfetto_trace=True)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        run()
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    log("traced {} steps at {:.1f} ms/batch -> {:.2f} fps".format(
        args.steps, dt * 1e3, B / dt))
    parse_perfetto(args.out, top=args.top, steps=args.steps)


if __name__ == "__main__":
    main()
