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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stem", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--conv-impl", default="xla", choices=["xla", "pallas"],
                    help="int8 trunk conv implementation")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mv3d_tf_tpu import eval as E

    log("device:", jax.devices()[0], "stem:", args.stem,
        "batch:", args.batch, "int8:", args.int8)
    if args.stem == "xla":
        E._fused_stem = lambda dtype: False

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

    quant = None
    if args.int8:
        from mv3d_tf_tpu import quant as Q
        quant = Q.build_quant_state(params, np.asarray(bev),
                                    np.asarray(image) - E.PIXEL_MEANS)
    detect = E.build_detect_batch_fn(compute_dtype=jnp.bfloat16,
                                     quant=quant,
                                     quant_conv_impl=args.conv_impl)

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


if __name__ == "__main__":
    main()
