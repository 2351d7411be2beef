#!/usr/bin/env python
"""Standalone fault probe for the s8 Pallas ROI pool (the suspected
faulting op of the int8+s2d fused detect graph — VERDICT r3 #1/#4).
Runs the exact pool calls the batched detector makes (both views,
production shapes, int8 features), NOTHING else. rc=0 + printed sums
means the op is clean in isolation.
"""
import argparse
import sys

import _init_paths  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="int8",
                    choices=["int8", "bfloat16"])
    ap.add_argument("--view", default="both",
                    choices=["bev", "img", "both"])
    ap.add_argument("--rois-per-step", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast
    from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD

    print("device:", jax.devices()[0], "dtype:", args.dtype,
          file=sys.stderr, flush=True)
    B, P = args.batch, 300
    rng = np.random.RandomState(0)
    dt = jnp.int8 if args.dtype == "int8" else jnp.bfloat16

    def mkfeat(h, w):
        a = rng.randint(0, 128, size=(B, h, w, 512))
        return jax.device_put(a.astype(np.int8)).astype(dt)

    def mkrois(h, w, scale=8):
        # production-like: random boxes in input coords, some degenerate
        x1 = rng.rand(B * P) * w * scale
        y1 = rng.rand(B * P) * h * scale
        x2 = x1 + rng.rand(B * P) * 60
        y2 = y1 + rng.rand(B * P) * 60
        fi = np.repeat(np.arange(B, dtype=np.float32), P)
        return jax.device_put(
            np.stack([fi, x1, y1, x2, y2], axis=1).astype(np.float32))

    import time

    def drive(name, feat, rois, **kw):
        @jax.jit
        def run(f, r):
            return roi_pool_fast(f, r, spatial_scale=1.0 / 8,
                                 rois_per_step=args.rois_per_step, **kw)
        out = run(feat, rois)
        s = float(np.asarray(jax.device_get(
            out.astype(jnp.float32).ravel()[0])))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(feat, rois)
        s = float(np.asarray(jax.device_get(
            out.astype(jnp.float32).ravel()[0])))
        dtms = (time.perf_counter() - t0) / args.iters * 1000
        print("{}: ok sum0={} {:.2f} ms/call".format(name, s, dtms),
              file=sys.stderr, flush=True)

    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)
    if args.view in ("bev", "both"):
        drive("bev", mkfeat(75, 75), mkrois(75, 75))
    if args.view in ("img", "both"):
        drive("img", mkfeat(48, 156), mkrois(48, 156),
              max_in_h=max_img_h, max_in_w=max_img_w)
    print("PROBE OK")


if __name__ == "__main__":
    main()
