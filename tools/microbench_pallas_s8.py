#!/usr/bin/env python
"""Settle the Pallas s8 matmul question (VERDICT r3 #6).

r3 measured matmul_s8_pallas at 54.9 TOP/s — BELOW the 125.7 TF/s bf16
rate and far below XLA's 197.7 TOP/s s8 dot chain. 54.9 TOP/s is
suspiciously close to the v5e f32 MXU rate (~49 TF/s = 1/4 of bf16
nominal), suggesting Mosaic lowered the s8 dot through an upconverted
(non-int8) MXU mode. This tool sweeps kernel variants to either find a
formulation that engages the int8 MXU path (>= 250 TOP/s target) or
demonstrate the stack limit with controls:

  xla_s8      — XLA dot_general s8xs8->s32 at the same shape (ceiling)
  xla_bf16    — XLA bf16 matmul (control)
  base        — r3 matmul_s8_pallas (bm,bk,bn = 512,1024,512)
  t<...>      — tile-shape sweep of the same kernel
  fullk       — no K loop / no accumulator: one dot per tile
  pldot       — pl.dot instead of lax.dot_general
  bf16_kernel — SAME kernel structure, bf16 operands, f32 acc: if this
                also lags its XLA twin the kernel structure starves the
                MXU; if it matches, the gap is s8-specific lowering
  i8acc_i32   — accumulate into the output ref directly (no scratch)

Each variant runs in this one process; the timing is pipelined with a
single scalar read per rep (PROGRESS.md measurement discipline).
"""

import argparse
import functools
import sys
import time

import _init_paths  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--only", default=None,
                    help="comma list of variant names to run")
    args = ap.parse_args()

    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    N = args.n
    a8 = jax.device_put(rng.randint(-127, 127, (N, N)).astype(np.int8))
    b8 = jax.device_put(rng.randint(-127, 127, (N, N)).astype(np.int8))
    abf = jax.device_put((rng.rand(N, N).astype(np.float32) - 0.5))
    fl = 2 * N * N * N

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

    def mm_kernel_acc(a_ref, b_ref, o_ref, acc_ref, acc_dt):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _done():
            o_ref[...] = acc_ref[...]

    def make_tiled(bm, bk, bn, in_dt, acc_dt):
        def run(a, b):
            return pl.pallas_call(
                functools.partial(mm_kernel_acc, acc_dt=acc_dt),
                grid=(N // bm, N // bn, N // bk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                    pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((N, N), acc_dt),
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
            )(a, b)

        return jax.jit(lambda a, b: jnp.sum(
            run(a, b).astype(jnp.float32)))

    def make_fullk(bm, bn, in_dt, acc_dt, use_pldot=False):
        def kernel(a_ref, b_ref, o_ref):
            if use_pldot:
                o_ref[...] = pl.dot(a_ref[...], b_ref[...]).astype(acc_dt)
            else:
                o_ref[...] = jax.lax.dot_general(
                    a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)

        def run(a, b):
            return pl.pallas_call(
                kernel,
                grid=(N // bm, N // bn),
                in_specs=[
                    pl.BlockSpec((bm, N), lambda i, j: (i, 0)),
                    pl.BlockSpec((N, bn), lambda i, j: (0, j)),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct((N, N), acc_dt),
            )(a, b)

        return jax.jit(lambda a, b: jnp.sum(
            run(a, b).astype(jnp.float32)))

    @jax.jit
    def xla_s8(a, b):
        c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(c.astype(jnp.float32))

    @jax.jit
    def xla_bf16(a, b):
        c = (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16))
        return jnp.sum(c.astype(jnp.float32))

    variants = [
        ("xla_s8", xla_s8, (a8, b8), "TOP/s"),
        ("xla_bf16", xla_bf16, (abf, abf), "TF/s"),
        ("base_512x1024x512", make_tiled(512, 1024, 512, jnp.int8,
                                         jnp.int32), (a8, b8), "TOP/s"),
        ("t_256x512x512", make_tiled(256, 512, 512, jnp.int8, jnp.int32),
         (a8, b8), "TOP/s"),
        ("t_512x512x512", make_tiled(512, 512, 512, jnp.int8, jnp.int32),
         (a8, b8), "TOP/s"),
        ("t_1024x1024x256", make_tiled(1024, 1024, 256, jnp.int8,
                                       jnp.int32), (a8, b8), "TOP/s"),
        ("t_256x2048x256", make_tiled(256, 2048, 256, jnp.int8,
                                      jnp.int32), (a8, b8), "TOP/s"),
        ("fullk_512x512", make_fullk(512, 512, jnp.int8, jnp.int32),
         (a8, b8), "TOP/s"),
        ("fullk_256x256", make_fullk(256, 256, jnp.int8, jnp.int32),
         (a8, b8), "TOP/s"),
        ("pldot_fullk_512", make_fullk(512, 512, jnp.int8, jnp.int32,
                                       use_pldot=True), (a8, b8), "TOP/s"),
        ("bf16_kernel_512x1024x512", make_tiled(512, 1024, 512,
                                                jnp.bfloat16, jnp.float32),
         (abf.astype(jnp.bfloat16), abf.astype(jnp.bfloat16)), "TF/s"),
        ("bf16_fullk_512", make_fullk(512, 512, jnp.bfloat16, jnp.float32),
         (abf.astype(jnp.bfloat16), abf.astype(jnp.bfloat16)), "TF/s"),
    ]
    only = set(args.only.split(",")) if args.only else None
    for name, fn, operands, unit in variants:
        if only and name not in only:
            continue
        try:
            t = timeit(fn, *operands)
            log("{:28s}: {:7.2f} ms  {:6.1f} {}".format(
                name, t * 1e3, fl / t / 1e12, unit))
        except Exception as e:  # noqa: BLE001 — keep sweeping
            log("{:28s}: FAILED {}".format(name, str(e)[:200]))


if __name__ == "__main__":
    main()
