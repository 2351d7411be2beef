"""Pallas BEV placement kernel — the fast path behind ops/bev.py.

The XLA formulation of last-write-wins rasterization needs two
scatter+gather rounds over a 3.25M-slot array; XLA TPU scatter
serializes at ~12 ns/update, so a (8, 131072)-point batch costs ~58 ms.
The TPU-native shape (SURVEY §7.1): ONE stable sort by the composite
seg key (cell*9 + slice) — after which both winner rules become run
boundaries —
  * height channel winner per (cell, slice) = last entry of its run
    (stable sort keeps file order; read_lidar.py:110 last-write-wins);
  * intensity winner per cell = last entry of the cell's run
    (= lexicographic (slice, ordinal) max, read_lidar.py:113 semantics).

Placement is fully VECTORIZED: winners of one raster row have UNIQUE
in-row offsets (distinct (cell, slice) for heights, distinct cells for
intensity, and the two families use disjoint offsets cell*9+{slice, 8}),
so their contributions combine with an order-free max. Each grid step
owns 8 raster rows; per row it walks the row's sorted winner range in
8-point sub-gulps, builds an (8, 43, 128) one-hot against the row
stripe, and max-reduces into a register accumulator — no scalar VMEM
access, no read-modify-write hazards, one dense store per row. Dead
cells are zeros, so HBM traffic is one 13 MB raster write per scan plus
the sorted point arrays.

seg is y-major, so each raster row owns one contiguous sorted range,
precomputed with searchsorted and passed via SMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mv3d_tf_tpu.geometry import BEV_C, BEV_H, BEV_W

ROWS_PER_STEP = 8
N_STEPS = 76                        # 8*76 = 608 rows cover the 601
ROW_SEGS = BEV_W * BEV_C            # segs per raster row (5409)
ROW_SUB = 43                        # row stripe stored as (43, 128)
ROW_LANE = 128                      # 43*128 = 5504 >= 5409
NO_REM = 8191                       # sentinel offset: matches no stripe slot
GULP = 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def bev_place_pallas(rem_h, rem_i, zs, rs, bounds, interpret=False):
    """Place sorted winners into the (B, 601, 601, 9) raster.

    Args:
      rem_h: (B, N) int32 in-row stripe offset (cell%601*9+slice) of
        height winners, NO_REM for everything else; sorted seg order.
      rem_i: (B, N) int32 stripe offset (cell%601*9+8) of intensity
        winners, NO_REM otherwise.
      zs: (B, N) f32 height values (z - HEIGHT_MIN), sorted order.
      rs: (B, N) f32 reflectance values, sorted order.
      bounds: (B, 609) int32 searchsorted per-row ranges over seg
        (row r's winners live at sorted indices [bounds[r], bounds[r+1])).
    Returns:
      (B, 601, 601, 9) float32.
    """
    B, N = rem_h.shape
    assert N % 128 == 0, N
    rem_h = rem_h.reshape(B, N // 128, 128)
    rem_i = rem_i.reshape(B, N // 128, 128)
    zs = zs.reshape(B, N // 128, 128)
    rs = rs.reshape(B, N // 128, 128)

    STRIPE = ROW_SUB * ROW_LANE

    def kernel(bounds_ref, rh_ref, ri_ref, zs_ref, rs_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (1, STRIPE), 1)

        for rr in range(ROWS_PER_STEP):
            row = t * ROWS_PER_STEP + rr
            lo = bounds_ref[b, row]
            hi = bounds_ref[b, row + 1]

            def blk(c, stripe, lo=lo, hi=hi):
                # transpose the 128-point block so gulp points sit on
                # SUBLANES (Mosaic cannot reshape lanes into sublanes)
                rh_t = rh_ref[0, pl.ds(c, 1), :].reshape(1, 128).T
                ri_t = ri_ref[0, pl.ds(c, 1), :].reshape(1, 128).T
                zs_t = zs_ref[0, pl.ds(c, 1), :].reshape(1, 128).T
                rs_t = rs_ref[0, pl.ds(c, 1), :].reshape(1, 128).T
                base = c * 128
                for k in range(128 // GULP):
                    g0 = base + k * GULP
                    idx = g0 + jax.lax.broadcasted_iota(
                        jnp.int32, (GULP, 1), 0)
                    ok = (idx >= lo) & (idx < hi)

                    def upd(stripe, k=k, ok=ok):
                        def hot_max(rem_t, val_t, acc):
                            rem = jax.lax.slice(rem_t, (k * GULP, 0),
                                                ((k + 1) * GULP, 1))
                            val = jax.lax.slice(val_t, (k * GULP, 0),
                                                ((k + 1) * GULP, 1))
                            # fold the range mask into the (GULP,1) rem
                            # scalars — cheaper than masking the wide hot
                            rem = jnp.where(ok, rem, NO_REM)
                            hot = flat_i == rem         # (GULP, STRIPE)
                            c2 = jnp.where(hot, val, jnp.float32(0))
                            return jnp.maximum(
                                acc, jnp.max(c2, axis=0, keepdims=True))

                        return hot_max(ri_t, rs_t,
                                       hot_max(rh_t, zs_t, stripe))

                    # most gulps of a boundary block lie outside the
                    # row's range — skip their vector work entirely
                    stripe = jax.lax.cond(
                        jnp.logical_and(g0 + GULP > lo, g0 < hi),
                        upd, lambda s: s, stripe)
                return stripe

            # empty rows ((hi+127)//128 > lo//128 even when hi == lo)
            # must not process a block at all
            c_lo = lo // 128
            c_hi = jnp.where(hi > lo, (hi + 127) // 128, c_lo)
            stripe = jax.lax.fori_loop(
                c_lo, c_hi, blk, jnp.zeros((1, STRIPE), jnp.float32))
            out_ref[0, rr] = stripe[0]

    grid = (B, N_STEPS)
    pt_spec = lambda: pl.BlockSpec((1, N // 128, 128),
                                   lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds
                  pt_spec(), pt_spec(), pt_spec(), pt_spec()],
        out_specs=pl.BlockSpec((1, ROWS_PER_STEP, ROW_SUB * ROW_LANE),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, N_STEPS * ROWS_PER_STEP, ROW_SUB * ROW_LANE), jnp.float32),
        interpret=interpret,
    )(bounds, rem_h, rem_i, zs, rs)
    return out[:, :BEV_H, :ROW_SEGS].reshape(B, BEV_H, BEV_W, BEV_C)
