"""Pallas TPU kernel for ROI max-pooling — the fast path behind
ops/roi_pool.py (same integer-exact bin semantics, cu.cc:20-85 lineage).

Why a kernel: the XLA gather formulation re-reads the feature map from
HBM mb_h times per roi (~GBs of traffic for 300 rois); here the whole
stride-8 feature map fits in VMEM (75x75x512 bf16 = 5.5 MB), so each
grid step (one roi) computes its 7x7 bins entirely on-chip. Bin bounds
are precomputed in the surrounding jit program and scalar-prefetched.

Batched feature maps are supported via a per-roi frame index in the
BlockSpec index_map (consecutive same-frame rois reuse the resident
block without re-DMA).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mv3d_tf_tpu.ops.roi_pool import _c_round

# Fault-probe hook (tools/probe_s8_fault.py): when True, pin the
# scalar-prefetch operands behind an optimization_barrier before the
# pallas_call.
_SCALAR_BARRIER = False

# SMEM scalar-prefetch budget in rois per pallas_call; module-level so
# tests can shrink it to force the chunked path (ADVICE r4).
_R_MAX = 4800

# Column-bin window width (see CWIN comment in the kernel). Module-level
# so bench_ab can A/B it: 8 = the minimum Mosaic-alignable window, ~2x
# less masked select/reduce work per bin than 16 for the typical 1-3
# feature-cell bin, at the cost of an extra segment iteration when a bin
# straddles an 8-boundary.
_CWIN = 16

# Shared-window bin stage (r5): the 7 column bins of one pooled row tile
# a CONTIGUOUS span, so one aligned RWIN read per (ph, segment) can feed
# all 7 bins with static masked reduces — ~7x fewer dynamic slices and
# no acc-scratch round-trip vs the per-bin CWIN windows. The per-bin
# path stays for A/B (bench_ab --pool-bins window).
_SHARED_BINS = True


def _bin_bounds(rois, pooled, spatial_scale, H, W):
    """Integer-exact bin bounds, identical to ops/roi_pool.py."""
    xs = _c_round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    ys = _c_round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    xe = _c_round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    ye = _c_round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(xe - xs + 1, 1)
    roi_h = jnp.maximum(ye - ys + 1, 1)
    ph = jnp.arange(pooled, dtype=jnp.int32)
    hstart = jnp.clip((ph[None] * roi_h[:, None]) // pooled + ys[:, None],
                      0, H)
    hend = jnp.clip(((ph[None] + 1) * roi_h[:, None] + pooled - 1) // pooled
                    + ys[:, None], 0, H)
    wstart = jnp.clip((ph[None] * roi_w[:, None]) // pooled + xs[:, None],
                      0, W)
    wend = jnp.clip(((ph[None] + 1) * roi_w[:, None] + pooled - 1) // pooled
                    + xs[:, None], 0, W)
    return hstart, hend, wstart, wend


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale",
                                             "max_in_h", "max_in_w",
                                             "interpret", "rois_per_step"))
def roi_pool_pallas(feat, rois, pooled=7, spatial_scale=1.0 / 8,
                    max_in_h=None, max_in_w=None, interpret=False,
                    rois_per_step=1):
    """Drop-in replacement for ops/roi_pool.roi_pool (same signature
    semantics; feat may be (H,W,C) or (B,H,W,C) with rois[:,0] = frame).

    rois_per_step > 1 processes a CONTIGUOUS block of rois per grid step,
    amortizing the fixed per-step cost (grid sequencing + output-block
    DMA) — the dominant cost at production roi counts (2400/view), where
    the per-roi compute is a few microseconds of VPU work. Requirements:
    R % rois_per_step == 0 and every block's rois pool from the SAME
    frame (callers with P rois/frame pass a divisor of P; the feature
    BlockSpec indexes by the block's first roi)."""
    R = rois.shape[0]
    RT = rois_per_step
    if RT > 1 and R % RT != 0:
        RT = 1

    # SMEM budget: the 5 scalar-prefetch arrays cost ~33 i32/roi after
    # sublane (7->8) and lane (R->ceil128) padding = ~132 B/roi against
    # the 1 MB SMEM cap. Large roi sets (batch 32 x 300 = 9600, or the
    # default-config eval's B x 2000) overflow it (r4:
    # experiments/results/r4/ab_s2dint8_b32.log, the test_net verify
    # drive) — split them into independent pallas_calls over contiguous
    # roi chunks. Chunk boundaries land on multiples of RT, preserving
    # the caller's same-frame-per-block contract; <= 4800 rois (the
    # headline batch-16 x 300 path) stays a single unchanged call.
    R_MAX = _R_MAX
    # max(..., RT) guards RT > R_MAX (chunk of 0 would make the range
    # below empty/ValueError); chunk < R guards the oversized-RT case
    # against infinite recursion — one RT-sized chunk still respects the
    # same-frame-per-block contract (ADVICE r4)
    chunk = max((R_MAX // RT) * RT, RT)
    if R > R_MAX and chunk < R:
        outs = [
            roi_pool_pallas(feat, rois[i:i + chunk], pooled=pooled,
                            spatial_scale=spatial_scale,
                            max_in_h=max_in_h, max_in_w=max_in_w,
                            interpret=interpret, rois_per_step=RT)
            for i in range(0, R, chunk)
        ]
        return jnp.concatenate(outs, axis=0)

    batched = feat.ndim == 4
    if not batched:
        feat = feat[None]
    B, H, W, C = feat.shape
    dtype = feat.dtype

    # Pad the width to a multiple of 8 so every dynamic column-window
    # start below (including the right-edge clamp W_pad - WIN) honors the
    # Mosaic sublane alignment promise. Bin bounds keep the ORIGINAL W,
    # so the pad columns are never selected by the (off < w1 <= W) mask.
    W_pad = -(-W // 8) * 8
    if W_pad != W:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))

    span_h = (max_in_h if max_in_h is not None else H / spatial_scale)
    span_w = (max_in_w if max_in_w is not None else W / spatial_scale)
    mb_h = min(H, -(-(int(round(span_h * spatial_scale)) + 1) // pooled) + 2)
    mb_w = min(W, -(-(int(round(span_w * spatial_scale)) + 1) // pooled) + 2)

    hstart, hend, wstart, wend = _bin_bounds(rois, pooled, spatial_scale,
                                             H, W)
    # scalar-prefetch arrays live in SMEM with rows padded to 128 lanes:
    # keep R on the LAST axis ((pooled, R), (1, R)) so padding is bounded
    hstart, hend = hstart.T, hend.T
    wstart, wend = wstart.T, wend.T
    bidx = (rois[:, 0].astype(jnp.int32) if batched else jnp.zeros(
        (R,), jnp.int32))[None, :]

    # channel-tile the grid so the double-buffered feature block stays
    # under the 16 MB VMEM budget; prefer the widest tile that fits
    # (fewer per-roi passes): BEV 75x80x512 bf16 fits whole (12.3 MB),
    # the image view (48x160) drops to 256.
    budget = 13 * 1024 * 1024
    isz = jnp.dtype(dtype).itemsize
    CT = min(C, 256 if isz <= 2 else 128)
    if C % 512 == 0 and 2 * H * W_pad * 512 * isz <= budget:
        CT = min(C, 512)
    if C % CT != 0:
        CT = min(C, 128)
    assert C % CT == 0
    # python scalar (not a jnp array: pallas kernels may not capture
    # traced constants); int features use the dtype min — an exact max
    # identity for the [0,127] post-requant-relu range
    neg = (int(jnp.iinfo(dtype).min)
           if jnp.issubdtype(dtype, jnp.integer) else -jnp.inf)
    # Mosaic cannot lower int8 max ops on this stack — neither reductions
    # ("Reductions over int8 not implemented") nor elementwise maximum
    # ("failed to legalize arith.maxsi", real-chip r2) — so for integer
    # features the whole max accumulator runs in int32: rows are widened
    # on read from the (still int8, half-DMA-bytes) VMEM feature block,
    # and the pooled result is narrowed on write.
    red_dt = jnp.int32 if jnp.issubdtype(dtype, jnp.integer) else dtype

    # column-bin window: CWIN columns starting at an 8-ALIGNED offset
    # (Mosaic allows dynamic sublane slices at multiples of 8). Bins
    # wider than one window fall back to a dynamic-count segment loop —
    # the same pattern as the row stage. CWIN is sized for the TYPICAL
    # bin (1-4 feature cells + alignment slack), not the worst case
    # (mb_w up to ~27 on the image view): the masked (window, CT) max is
    # the kernel's dominant VPU cost, 49 bins/roi, so a 16-wide window
    # does ~2.5x less select/reduce work than the old worst-case-sized
    # WIN=40 while wide bins just take extra segments.
    CWIN = min(W_pad, _CWIN)
    # row-max window: the H-reduction only needs the roi's COLUMN span,
    # not the full padded width (a car roi spans ~5-8 BEV / ~15-20 image
    # cells of W_pad = 80 / 160). RWIN covers a typical roi in ONE
    # aligned segment; wide rois fall back to a dynamic-count segment
    # loop over the same aligned window (uniform code, no cond).
    RWIN = min(W_pad, 32)

    def kernel(bidx_ref, hs_ref, he_ref, ws_ref, we_ref, feat_ref, out_ref,
               acc_ref):
        # grid is (C-tiles, R-blocks) with blocks innermost: consecutive
        # roi blocks of the same frame keep the SAME feature-block index,
        # so the pipeline re-DMAs the block only at frame/ctile
        # boundaries (~B*C/CT fetches) instead of every step
        base_r = pl.program_id(1) * RT
        iota_cwin = jax.lax.broadcasted_iota(jnp.int32, (CWIN, 1), 0)
        iota_rwin = jax.lax.broadcasted_iota(jnp.int32, (RWIN, 1), 0)

        def one_roi_shared(rr, _):
            # shared-window bin stage (_SHARED_BINS): the kernel's cost
            # is SEQUENCING, not ALU — 49 bins/roi each paying a dynamic
            # slice + a trip-counted fori. Here each (ph, segment) does
            # ONE row-reduced aligned RWIN window and all 7 column bins
            # consume it via static masked reduces (bin bounds are
            # monotone, so the bins tile the roi span the segments walk).
            # No acc scratch: the segment max feeds the bins directly.
            r = base_r + rr
            span0 = ws_ref[0, r]
            span1 = we_ref[pooled - 1, r]
            span_base = jnp.clip((span0 // 8) * 8, 0, W_pad - RWIN)
            nseg = jnp.maximum(1, (span1 - span_base + RWIN - 1) // RWIN)
            negf = jnp.full((RWIN, CT), neg, red_dt)
            for ph in range(pooled):
                h0 = hs_ref[ph, r]
                h1 = he_ref[ph, r]

                def seg_body(s, bins):
                    off = jnp.clip(span_base + s * RWIN, 0, W_pad - RWIN)
                    off = pl.multiple_of(off, 8)
                    a = jax.lax.fori_loop(
                        h0, h1,
                        lambda h, a: jnp.maximum(
                            a, feat_ref[0, h, pl.ds(off, RWIN), :]
                            .astype(red_dt)),
                        negf)
                    offs = iota_rwin + off
                    new = []
                    for pw in range(pooled):
                        mask = (offs >= ws_ref[pw, r]) & (offs < we_ref[pw, r])
                        m = jnp.max(jnp.where(mask, a, negf),
                                    axis=0, keepdims=True)
                        new.append(jnp.maximum(bins[pw], m))
                    return tuple(new)

                bins = jax.lax.fori_loop(
                    0, nseg, seg_body,
                    tuple(jnp.full((1, CT), neg, red_dt)
                          for _ in range(pooled)))
                for pw in range(pooled):
                    empty = (h1 <= h0) | (we_ref[pw, r] <= ws_ref[pw, r])
                    out_ref[rr, ph, pw, :] = jnp.where(
                        empty, jnp.zeros((CT,), dtype),
                        bins[pw][0].astype(dtype))
            return 0

        def one_roi(rr, _):
            r = base_r + rr
            # the roi's full column span (bin bounds are monotone)
            span0 = ws_ref[0, r]
            span1 = we_ref[pooled - 1, r]
            span_base = jnp.clip((span0 // 8) * 8, 0, W_pad - RWIN)
            nseg = jnp.maximum(1, (span1 - span_base + RWIN - 1) // RWIN)
            for ph in range(pooled):
                h0 = hs_ref[ph, r]
                h1 = he_ref[ph, r]
                # H-indexing a (1,H,W,CT) VMEM ref is offset-free (the
                # tiled dims are W,C); arbitrary W offsets are NOT —
                # hence the aligned-window trick below for columns. The
                # row loop has DYNAMIC bounds: typical BEV car rois span
                # 1-2 feature rows vs the static worst case of ~13, so
                # masking a fixed unroll wastes ~6x the work. Columns are
                # reduced RWIN at a time over the roi span only; scratch
                # regions outside the span hold stale values, which the
                # pw mask below never selects (w0 >= span_base).
                def seg_body(s, _):
                    off = jnp.clip(span_base + s * RWIN, 0, W_pad - RWIN)
                    off = pl.multiple_of(off, 8)
                    a = jax.lax.fori_loop(
                        h0, h1,
                        lambda h, a: jnp.maximum(
                            a, feat_ref[0, h, pl.ds(off, RWIN), :]
                            .astype(red_dt)),
                        jnp.full((RWIN, CT), neg, red_dt))
                    acc_ref[pl.ds(off, RWIN), :] = a
                    return 0
                jax.lax.fori_loop(0, nseg, seg_body, 0)
                for pw in range(pooled):
                    w0 = ws_ref[pw, r]
                    w1 = we_ref[pw, r]
                    base = jnp.clip((w0 // 8) * 8, 0, W_pad - CWIN)
                    nsw = jnp.maximum(1, (w1 - base + CWIN - 1) // CWIN)

                    def wseg(s, m):
                        off = jnp.clip(base + s * CWIN, 0, W_pad - CWIN)
                        off = pl.multiple_of(off, 8)
                        win = acc_ref[pl.ds(off, CWIN), :]
                        offs = iota_cwin + off
                        mask = (offs >= w0) & (offs < w1)
                        return jnp.maximum(m, jnp.max(
                            jnp.where(mask, win,
                                      jnp.full((CWIN, CT), neg, red_dt)),
                            axis=0, keepdims=True))

                    m = jax.lax.fori_loop(
                        0, nsw, wseg, jnp.full((1, CT), neg, red_dt))
                    m = m[0].astype(dtype)
                    empty = (h1 <= h0) | (w1 <= w0)
                    out_ref[rr, ph, pw, :] = jnp.where(
                        empty, jnp.zeros((CT,), dtype), m)
            return 0

        body = one_roi_shared if _SHARED_BINS else one_roi
        if RT == 1:
            body(0, 0)
        else:
            jax.lax.fori_loop(0, RT, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(C // CT, R // RT),
        in_specs=[
            pl.BlockSpec((1, H, W_pad, CT),
                         lambda c, r, bidx_ref, *_: (bidx_ref[0, r * RT],
                                                     0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, pooled, pooled, CT),
                               lambda c, r, *_: (r, 0, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W_pad, CT), red_dt)],
    )

    if _SCALAR_BARRIER:
        bidx, hstart, hend, wstart, wend = jax.lax.optimization_barrier(
            (bidx, hstart, hend, wstart, wend))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, pooled, pooled, C), dtype),
        interpret=interpret,
    )(bidx, hstart, hend, wstart, wend, feat)
    return out


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale",
                                             "max_in_h", "max_in_w",
                                             "interpret"))
def roi_pool_pallas_bwd(feat, rois, out, dy, pooled=7, spatial_scale=1.0 / 8,
                        max_in_h=None, max_in_w=None, interpret=False):
    """Gradient of ROI max-pooling w.r.t. the feature map, single frame.

    The CUDA backward replays the forward argmax
    (roi_pooling_op_gpu.cu.cc:113-190); here the max position is
    RECOMPUTED by equality — dy[r,ph,pw,c] flows to the in-bin cells
    whose value equals the pooled output, DIVIDED by the number of such
    cells (even split among ties). Ties are common in practice: sparse
    post-ReLU feature maps produce all-zero bins where every cell equals
    the max, so flowing the full cotangent to each (the naive replay)
    would multiply the gradient by the bin area. Even splitting matches
    jnp.max's transpose; the CUDA kernel picks the first argmax instead —
    both conserve the total cotangent mass per bin. Overlapping
    rois/bins sum, matching scatter-add.

    feat (H, W, C), rois (R, 5), out/dy (R, pooled, pooled, C); returns
    dfeat (H, W, C) float32.
    """
    H, W, C = feat.shape
    R = rois.shape[0]
    dtype = feat.dtype

    W_pad = -(-W // 8) * 8
    if W_pad != W:
        feat = jnp.pad(feat, ((0, 0), (0, W_pad - W), (0, 0)))

    span_h = (max_in_h if max_in_h is not None else H / spatial_scale)
    span_w = (max_in_w if max_in_w is not None else W / spatial_scale)
    mb_w = min(W, -(-(int(round(span_w * spatial_scale)) + 1) // pooled) + 2)

    hstart, hend, wstart, wend = _bin_bounds(rois, pooled, spatial_scale,
                                             H, W)
    hstart, hend = hstart.T, hend.T
    wstart, wend = wstart.T, wend.T

    CT = min(C, 128)
    assert C % CT == 0
    # chunk rois over the grid: the dfeat block keeps the SAME index for
    # every roi-step, so it stays VMEM-resident and accumulates across
    # steps while the (RB,7,7,CT) out/dy blocks stream in — the whole
    # working set stays under the 16 MB scoped-vmem budget
    RB = 32 if R % 32 == 0 else (8 if R % 8 == 0 else 1)
    WIN = min(W_pad, ((mb_w + 7 + 8) // 8) * 8)

    dy = dy.astype(jnp.float32)

    def kernel(hs_ref, he_ref, ws_ref, we_ref, feat_ref, out_ref, dy_ref,
               dfeat_ref, cnt_ref):
        rstep = pl.program_id(1)

        @pl.when(rstep == 0)
        def _():
            dfeat_ref[...] = jnp.zeros((H, W_pad, CT), jnp.float32)

        iota_win = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)

        def bin_indicator(h, rr, ph, pw, r):
            """(eqf*mask, base) for bin (ph,pw) of roi rr at feature row
            h — 1.0 where the cell ties the pooled max, else 0.0."""
            w0 = ws_ref[pw, r]
            w1 = we_ref[pw, r]
            base = jnp.clip((w0 // 8) * 8, 0, W_pad - WIN)
            bal = pl.multiple_of(base, 8)
            win = feat_ref[h, pl.ds(bal, WIN), :]  # (WIN, CT)
            off = iota_win + base
            mask = (off >= w0) & (off < w1)
            o = out_ref[rr, ph, pw:pw + 1, :]   # (1, CT)
            # boolean ops between broadcast shapes trip a Mosaic
            # i1-relayout bug — build the equality indicator in f32
            # arithmetic: 1 - sign(|diff|)
            diff = win.astype(jnp.float32) - o.astype(jnp.float32)
            eqf = 1.0 - jnp.sign(jnp.abs(diff))
            return eqf * mask.astype(jnp.float32), bal

        def roi_body(rr, _):
            r = rstep * RB + rr
            for ph in range(pooled):
                h0 = hs_ref[ph, r]
                h1 = he_ref[ph, r]

                # pass 1: per-bin tie count (cells equal to the max)
                cnt_ref[...] = jnp.zeros((8, CT), jnp.float32)

                def cnt_body(h, _):
                    for pw in range(pooled):
                        ind, _bal = bin_indicator(h, rr, ph, pw, r)
                        cnt_ref[pw, :] = cnt_ref[pw, :] + jnp.sum(
                            ind, axis=0)
                    return 0

                jax.lax.fori_loop(h0, h1, cnt_body, 0)

                # pass 2: distribute dy/count to each tying cell
                def h_body(h, _):
                    for pw in range(pooled):
                        ind, bal = bin_indicator(h, rr, ph, pw, r)
                        d = dy_ref[rr, ph, pw:pw + 1, :]    # (1, CT) f32
                        inv = 1.0 / jnp.maximum(
                            cnt_ref[pw:pw + 1, :], 1.0)     # (1, CT)
                        contrib = d * inv * ind
                        dfeat_ref[h, pl.ds(bal, WIN), :] = (
                            dfeat_ref[h, pl.ds(bal, WIN), :] + contrib)
                    return 0

                jax.lax.fori_loop(h0, h1, h_body, 0)
            return 0

        jax.lax.fori_loop(0, RB, roi_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C // CT, R // RB),
        in_specs=[
            pl.BlockSpec((H, W_pad, CT), lambda c, r, *_: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, pooled, pooled, CT),
                         lambda c, r, *_: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, pooled, pooled, CT),
                         lambda c, r, *_: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W_pad, CT), lambda c, r, *_: (0, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, CT), jnp.float32)],
    )

    dfeat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W_pad, C), jnp.float32),
        interpret=interpret,
    )(hstart, hend, wstart, wend, feat, out.astype(dtype), dy)
    return dfeat[:, :W, :]
