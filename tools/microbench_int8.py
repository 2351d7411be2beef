#!/usr/bin/env python
"""Microbenchmarks for the int8 trunk decision: XLA s8 conv vs im2col+s8
matmul vs bf16, at the exact MV3D trunk shapes.

The v5e MXU promises 394 TOPS int8 vs 197 TFLOPS bf16 (2x). Round-2
measurement: XLA s8 CONVS deliver only ~1.3x over bf16 — this tool
checks whether s8 MATMULS do better, which decides whether reformulating
the trunk convs as im2col+dot (or a Pallas kernel) is worth it.

Pipelined timing with one scalar read per rep (PROGRESS.md discipline).
"""

import argparse
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pallas", action="store_true",
                    help="also measure the Pallas s8 matmul/conv kernels")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    log("device:", jax.devices()[0])
    rng = np.random.RandomState(0)

    def barrier(x):
        return float(np.asarray(jax.device_get(x.ravel()[0]), np.float32))

    def timeit(fn, *a):
        out = fn(*a)
        barrier(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            barrier(out)
            ts.append((time.perf_counter() - t0) / args.iters)
        return min(ts)

    # ---- 1. square matmuls: bf16 vs s8 ----------------------------------
    N = 4096
    a8 = jax.device_put(rng.randint(-127, 127, (N, N)).astype(np.int8))
    b8 = jax.device_put(rng.randint(-127, 127, (N, N)).astype(np.int8))
    abf = jax.device_put(rng.rand(N, N).astype(np.float32) - 0.5)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.sum((a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16))
                       .astype(jnp.float32))

    @jax.jit
    def mm_s8(a, b):
        c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(c.astype(jnp.float32))

    # chain 4 matmuls per dispatch so the reduction doesn't dominate
    @jax.jit
    def mm_s8_chain(a, b):
        c = a
        for _ in range(4):
            c = jnp.clip(jax.lax.dot_general(
                c, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) >> 8, -127, 127
            ).astype(jnp.int8)
        return jnp.sum(c.astype(jnp.float32))

    @jax.jit
    def mm_bf16_chain(a, b):
        c = a.astype(jnp.bfloat16)
        bb = b.astype(jnp.bfloat16)
        for _ in range(4):
            c = (c @ bb) * jnp.bfloat16(1e-3)
        return jnp.sum(c.astype(jnp.float32))

    fl = 2 * N * N * N
    if args.pallas:
        from mv3d_tf_tpu.ops.conv_s8_pallas import (conv3x3_s8_pallas,
                                                    conv3x3_s8_pallas_v2,
                                                    matmul_s8_pallas)

        @jax.jit
        def mm_s8_pal(a, b):
            return jnp.sum(matmul_s8_pallas(a, b).astype(jnp.float32))

        t = timeit(mm_s8_pal, a8, b8)
        log("matmul 4096^3 s8 PALLAS   : {:7.2f} ms  {:6.1f} TOP/s".format(
            t * 1e3, fl / t / 1e12))

        B = 8
        for H, W, Cin, Cout, name in [(300, 300, 128, 128, "conv2_2"),
                                      (150, 150, 256, 256, "conv3_2"),
                                      (75, 75, 512, 512, "conv5_x"),
                                      (48, 156, 512, 512, "conv5_img")]:
            x8c = jax.device_put(
                rng.randint(0, 128, (B, H, W, Cin)).astype(np.int8))
            w8c = jax.device_put(
                rng.randint(-127, 127, (3, 3, Cin, Cout)).astype(np.int8))
            kc = jax.device_put((rng.rand(Cout) * 1e-3).astype(np.float32))
            bc = jax.device_put(rng.rand(Cout).astype(np.float32))
            from mv3d_tf_tpu.quant import _s8_tile_rows
            tr = _s8_tile_rows(H)
            fl_c = 2 * B * H * W * 9 * Cin * Cout
            for label, kern in (("v1", conv3x3_s8_pallas),
                                ("v2", conv3x3_s8_pallas_v2)):

                @jax.jit
                def conv_pal(x, w, k, b, tr=tr, kern=kern):
                    return jnp.sum(kern(
                        x, w, k, b, tile_rows=tr).astype(jnp.float32))

                t = timeit(conv_pal, x8c, w8c, kc, bc)
                log("{:10s} s8 PALLAS {} conv {:6.2f} ms {:6.1f} TOP/s"
                    .format(name, label, t * 1e3, fl_c / t / 1e12))
        return

    t = timeit(mm_bf16, abf, abf)
    log("matmul 4096^3 bf16        : {:7.2f} ms  {:6.1f} TF/s".format(
        t * 1e3, fl / t / 1e12))
    t = timeit(mm_s8, a8, b8)
    log("matmul 4096^3 s8->s32     : {:7.2f} ms  {:6.1f} TOP/s".format(
        t * 1e3, fl / t / 1e12))
    t = timeit(mm_bf16_chain, abf, abf)
    log("matmul chain x4 bf16      : {:7.2f} ms  {:6.1f} TF/s".format(
        t * 1e3, 4 * fl / t / 1e12))
    t = timeit(mm_s8_chain, a8, b8)
    log("matmul chain x4 s8(requant): {:6.2f} ms  {:6.1f} TOP/s".format(
        t * 1e3, 4 * fl / t / 1e12))

    # ---- 2. trunk conv shapes: bf16 conv vs s8 conv vs im2col+s8 dot ----
    B = 8
    shapes = [  # (H, W, Cin, Cout, name)
        (301, 301, 128, 128, "conv2_2"),
        (151, 151, 256, 256, "conv3_2"),
        (76, 76, 512, 512, "conv5_x"),
        (48, 156, 512, 512, "conv5_img"),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    for H, W, Cin, Cout, name in shapes:
        x8 = jax.device_put(
            rng.randint(-127, 127, (B, H, W, Cin)).astype(np.int8))
        w8 = jax.device_put(
            rng.randint(-127, 127, (3, 3, Cin, Cout)).astype(np.int8))
        xb = jax.device_put(rng.rand(B, H, W, Cin).astype(np.float32))
        wb = jax.device_put(rng.rand(3, 3, Cin, Cout).astype(np.float32))

        @jax.jit
        def conv_bf16(x, w):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
                "SAME", dimension_numbers=dn)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def conv_s8(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def conv_im2col_s8(x, w):
            # SAME 3x3 im2col: pad then 9 shifted views -> (B,H,W,9Cin)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [xp[:, u:u + H, v:v + W, :] for u in range(3)
                    for v in range(3)]
            im = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * Cin)
            y = jax.lax.dot_general(
                im, w.reshape(9 * Cin, Cout), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def conv_dots_s8(x, w):
            # 9 shifted accumulated dots (quant._conv_s8_dots): no 9xCin
            # concat materialization, rides the fast s8 dot path
            from mv3d_tf_tpu.quant import _conv_s8_dots
            return jnp.sum(_conv_s8_dots(x, w).astype(jnp.float32))

        fl = 2 * B * H * W * 9 * Cin * Cout
        tb = timeit(conv_bf16, xb, wb)
        ts = timeit(conv_s8, x8, w8)
        ti = timeit(conv_im2col_s8, x8, w8)
        td = timeit(conv_dots_s8, x8, w8)
        log("{:10s} bf16 {:6.2f} ms {:6.1f} TF/s | s8conv {:6.2f} ms "
            "{:6.1f} TOP/s | im2col+s8dot {:6.2f} ms {:6.1f} TOP/s | "
            "9dots {:6.2f} ms {:6.1f} TOP/s".format(
                name, tb * 1e3, fl / tb / 1e12, ts * 1e3, fl / ts / 1e12,
                ti * 1e3, fl / ti / 1e12, td * 1e3, fl / td / 1e12))


if __name__ == "__main__":
    main()
