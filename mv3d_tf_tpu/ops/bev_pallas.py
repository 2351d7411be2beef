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

Placement is a FACTORED ONE-HOT MATMUL scatter. Winners of one raster
row have UNIQUE in-row offsets (distinct (cell, slice) for heights,
distinct cells for intensity, and the two families use disjoint offsets
cell*9+{slice, 8}), so summation places each value exactly once — and a
sum-scatter is a matmul: factor the offset rem = s*128 + l into a
sublane one-hot (128 pts, 48 sublanes) and a value-carrying lane
one-hot (128 pts, 128 lanes); then

    row_stripe (48, 128) += onehot_s^T  @  (v * onehot_l)

is ONE small MXU contraction per 128-point block. Per point the VPU
builds 176 one-hot entries instead of materializing a 5504-wide
comparison (the previous design) — ~6x less vector work; the MXU does
the scatter for free. Both winner families accumulate into the same
stripe (disjoint offsets). Exactness: each output cell receives exactly
one nonzero product v*1 — bf16x3-decomposed f32 multiply-accumulate of
a single value against 1.0 reproduces v bit-exactly, verified by the
bit-parity tests vs the numpy twin.

seg is y-major, so each raster row owns one contiguous sorted range,
precomputed with searchsorted and passed via SMEM. Each grid step owns
8 raster rows, written as (8, 48, 128) stripes; the (B, 608, 48*128) ->
(B, 601, 601, 9) unpack happens in XLA.
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
ROW_SUB = 48                        # row stripe stored as (48, 128)
ROW_LANE = 128                      # 48*128 = 6144 >= 5409
NO_REM = 8191                       # sentinel: sublane 63 >= ROW_SUB
BLK = 128                           # points per accumulation block


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
    assert N % BLK == 0, N
    rem_h = rem_h.reshape(B, N // BLK, BLK)
    rem_i = rem_i.reshape(B, N // BLK, BLK)
    zs = zs.reshape(B, N // BLK, BLK)
    rs = rs.reshape(B, N // BLK, BLK)

    def kernel(bounds_ref, rh_ref, ri_ref, zs_ref, rs_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (BLK, ROW_SUB), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (BLK, ROW_LANE), 1)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)

        for rr in range(ROWS_PER_STEP):
            row = t * ROWS_PER_STEP + rr
            lo = bounds_ref[b, row]
            hi = bounds_ref[b, row + 1]

            def blk(c, acc, lo=lo, hi=hi):
                # transpose the 128-point block so points sit on
                # SUBLANES (Mosaic cannot reshape lanes into sublanes)
                rh_t = rh_ref[0, pl.ds(c, 1), :].reshape(1, BLK).T
                ri_t = ri_ref[0, pl.ds(c, 1), :].reshape(1, BLK).T
                zs_t = zs_ref[0, pl.ds(c, 1), :].reshape(1, BLK).T
                rs_t = rs_ref[0, pl.ds(c, 1), :].reshape(1, BLK).T
                idx = c * BLK + iota_p
                ok = (idx >= lo) & (idx < hi)

                def fam(rem_t, val_t, acc):
                    # out-of-range block entries fall on the sentinel
                    # sublane 63 >= ROW_SUB and vanish from onehot_s
                    rem = jnp.where(ok, rem_t, NO_REM)
                    oh_s = (rem // ROW_LANE == iota_s).astype(jnp.float32)
                    vl = jnp.where(rem % ROW_LANE == iota_l, val_t,
                                   jnp.float32(0))
                    # HIGHEST precision: Mosaic's default f32 dot rounds
                    # operands through bf16, corrupting the placed
                    # values; the 6-pass emulation keeps them bit-exact
                    # (verified vs the numpy twin on real TPU).
                    return acc + jax.lax.dot_general(
                        oh_s, vl, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

                return fam(ri_t, rs_t, fam(rh_t, zs_t, acc))

            # empty rows ((hi+127)//128 > lo//128 even when hi == lo)
            # must not process a block at all
            c_lo = lo // BLK
            c_hi = jnp.where(hi > lo, (hi + BLK - 1) // BLK, c_lo)
            acc = jax.lax.fori_loop(
                c_lo, c_hi, blk,
                jnp.zeros((ROW_SUB, ROW_LANE), jnp.float32))
            out_ref[0, rr] = acc

    grid = (B, N_STEPS)
    pt_spec = lambda: pl.BlockSpec((1, N // BLK, BLK),
                                   lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds
                  pt_spec(), pt_spec(), pt_spec(), pt_spec()],
        out_specs=pl.BlockSpec((1, ROWS_PER_STEP, ROW_SUB, ROW_LANE),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, N_STEPS * ROWS_PER_STEP, ROW_SUB, ROW_LANE), jnp.float32),
        interpret=interpret,
    )(bounds, rem_h, rem_i, zs, rs)
    out = out.reshape(B, N_STEPS * ROWS_PER_STEP, ROW_SUB * ROW_LANE)
    return out[:, :BEV_H, :ROW_SEGS].reshape(B, BEV_H, BEV_W, BEV_C)
