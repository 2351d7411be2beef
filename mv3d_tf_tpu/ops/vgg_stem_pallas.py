"""Fused VGG stem (conv1_1 + ReLU + conv1_2 + ReLU + 2x2 pool) as one
Pallas TPU kernel.

Why: the stem is HBM-bandwidth-bound under XLA. At 601x601 (BEV) /
384x1248 (image) with 64 channels, XLA materializes the two full-res
conv outputs in HBM (~370-490 MB each per batch of 8) — ~1.6-2.1 GB of
traffic per trunk for ~250 GF of compute, i.e. the measured 9-38 GF/ms
for conv1_1/conv1_2 vs ~200+ GF/ms for the deeper layers. Fusing the
stem keeps both intermediates in VMEM: traffic drops to reading the
input once and writing the pooled (H/2, W/2, 64) output once.

Semantics match mv3d_tf_tpu/models/vgg.py exactly (SAME 3x3 convs +
ReLU, 2x2 stride-2 VALID max pool; lib/networks/MV3D_train.py:44-49
lineage): golden-tested against the XLA path in interpret mode and on
real TPU (bf16 one-ulp agreement; accumulation order differs).

Design (per grid step = one frame x TR pooled rows, full width):
  * input pre-transformed once in XLA to (B, H_pad, 2*CP, Wh) bf16 —
    channels on sublanes, width on lanes, and the width DE-INTERLEAVED
    into even/odd column halves (sublane blocks [0:CP] / [CP:2CP]).
    De-interleaving makes every conv shift a pltpu.roll on a half-width
    buffer and the 2x2 pool a plain max(even, odd) — Mosaic cannot
    lower stride-2 lane/sublane selects (gather), so the interleaved
    formulation is not implementable, let alone fast;
  * the 2-row conv halo comes from THREE auto-pipelined views of the
    same input (prev/cur/next row-block) instead of manual DMA;
  * each 3x3 conv row is TWO MXU matmuls (even / odd output columns)
    over an in-VMEM im2col: conv1_1 (64,9*CP)@(9*CP,Wh), conv1_2
    (64,576)@(576,Wh) — K=576 fills the MXU contraction dim;
  * vertical + horizontal pooling and the NHWC transpose happen in
    registers before the single HBM store.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = 16  # padded input channels (sublane tile for bf16)

# Mosaic mis-lowers this kernel when the half-width pads to a SINGLE
# 128-lane tile (Wh == 128): measured rel ~0.42 vs the XLA path for any
# W <= 256, while W >= 384-ish (Wh >= 256) agrees to bf16 tolerance on
# the same stack (bisected r2; interpret mode is exact at every width,
# so the bug is in lowering — most plausibly the lane-rotate used for
# the conv taps on a one-tile buffer). Both shipping widths (BEV 601 ->
# Wh 384, image 1248 -> Wh 640) are safe; narrow inputs must refuse
# rather than silently corrupt.
MIN_SAFE_W = 384


def stem_width_supported(W):
    """True if vgg_stem_pallas lowers correctly for this input width."""
    return -(-((W + 1) // 2) // 128) * 128 >= 256


def _prep_input(x, H_pad, Wh):
    """(B,H,W,Cin) -> (B,H_pad,2*CP,Wh) bf16: sublanes [0:CP] hold the
    EVEN columns, [CP:2CP] the ODD columns, zero padded everywhere."""
    B, H, W, Cin = x.shape
    xt = jnp.transpose(x.astype(jnp.bfloat16), (0, 1, 3, 2))  # (B,H,Cin,W)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, CP - Cin), (0, 0)))
    xe = xt[..., 0::2]                                  # (B,H,CP,ceil(W/2))
    xo = xt[..., 1::2]                                  # (B,H,CP,W//2)
    xe = jnp.pad(xe, ((0, 0), (0, 0), (0, 0), (0, Wh - xe.shape[-1])))
    xo = jnp.pad(xo, ((0, 0), (0, 0), (0, 0), (0, Wh - xo.shape[-1])))
    out = jnp.concatenate([xe, xo], axis=2)             # (B,H,2CP,Wh)
    return jnp.pad(out, ((0, 0), (0, H_pad - H), (0, 0), (0, 0)))


def _prep_weights(w1, b1, w2, b2, dtype=jnp.bfloat16):
    """w1 (3,3,Cin,64) -> (64, 9*CP); w2 (3,3,64,64) -> (64, 576);
    biases -> (64, 1) f32 columns. Row order (u*3+v)*C + c matches the
    kernel's im2col block layout."""
    Cin = w1.shape[2]
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, CP - Cin), (0, 0)))
    w1f = w1p.reshape(9 * CP, 64).T.astype(dtype)
    w2f = w2.reshape(9 * 64, 64).T.astype(dtype)
    return (w1f, b1.reshape(64, 1).astype(jnp.float32),
            w2f, b2.reshape(64, 1).astype(jnp.float32))


def _roll(slab, shift):
    """Roll along the LANE (last) axis; Mosaic only rotates 32-bit data,
    so bf16 rolls go through f32 (exact — f32 represents every bf16)."""
    ax = slab.ndim - 1
    if slab.dtype == jnp.bfloat16:
        return pltpu.roll(slab.astype(jnp.float32), shift,
                          axis=ax).astype(jnp.bfloat16)
    return pltpu.roll(slab, shift, axis=ax)


def _left(slab):
    """Lane j -> value of lane j-1 (wrap lands in zero padding)."""
    return _roll(slab, 1)


def _right(slab):
    """Lane j -> value of lane j+1 (wrap junk must be masked by caller)."""
    return _roll(slab, slab.shape[-1] - 1)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def vgg_stem_pallas(x, w1, b1, w2, b2, tile_rows=8, interpret=False):
    """pool2x2(relu(conv1_2(relu(conv1_1(x))))) fused.

    Args:
      x: (B, H, W, Cin) float; Cin <= 16.
      w1: (3, 3, Cin, 64); b1: (64,); w2: (3, 3, 64, 64); b2: (64,).
      tile_rows: pooled rows per grid step; must divide H//2.
    Returns:
      (B, H//2, W//2, 64) bfloat16.
    """
    B, H, W, Cin = x.shape
    if not (interpret or stem_width_supported(W)):
        raise ValueError(
            "vgg_stem_pallas: W={} pads to a single 128-lane tile, which "
            "the current Mosaic stack mis-lowers (see MIN_SAFE_W note); "
            "use the XLA conv path for narrow inputs".format(W))
    H2, W2 = H // 2, W // 2
    We, Wo = (W + 1) // 2, W // 2      # valid even / odd column counts
    TR = tile_rows
    assert H2 % TR == 0, (H2, TR)
    nrt = H2 // TR
    R = 2 * TR  # conv rows per step

    Wh = -(-We // 128) * 128            # lane-aligned half width
    H_pad = R * (nrt + 1)               # one extra zero block for the halo
    xt = _prep_input(x, H_pad, Wh)
    w1f, b1c, w2f, b2c = _prep_weights(w1, b1, w2, b2)
    K1 = 9 * CP

    def kernel(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               out_ref, xt_ref, y1_ref, im_ref):
        rt = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (64, Wh), 1)
        in_e, in_o = lane < We, lane < Wo

        # assemble the haloed input tile (R+4 rows = global x rows
        # base-2 .. base+R+2) from the three views; rows 0-1 are zero at
        # the top edge (SAME padding), bottom zeros come via H_pad
        top = prev_ref[0, R - 2:R]
        xt_ref[0:2] = jnp.where(rt > 0, top, jnp.zeros_like(top))
        xt_ref[2:R + 2] = cur_ref[0]
        xt_ref[R + 2:R + 4] = next_ref[0, 0:2]

        def conv_row(e, o, w_ref, b_ref, n, row_ok, parity):
            """Half a conv output row (even or odd columns): build the
            im2col from the (n, Wh) even/odd input slabs, one MXU dot."""
            if parity == 0:        # even cols 2j: v taps odd[j-1], e, o
                taps = (_left(o), e, o)
            else:                  # odd cols 2j+1: taps e[j], o[j], e[j+1]
                taps = (e, o, _right(e))
            for u in range(3):
                for v in range(3):
                    im_ref[pl.ds((u * 3 + v) * n, n), :] = taps[v][u]
            acc = jax.lax.dot_general(
                w_ref[:], im_ref[pl.ds(0, 9 * n), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(acc + b_ref[:], 0.0)
            msk = jnp.logical_and(row_ok, in_e if parity == 0 else in_o)
            return jnp.where(msk, y, 0.0).astype(jnp.bfloat16)

        # ---- conv1_1: R+2 output rows (halo 1 for conv1_2) ----
        def body1(rr, _):
            g = R * rt + (rr - 1)      # global conv row
            # conv1_2's SAME padding: halo rows outside [0,H) read as 0
            row_ok = jnp.logical_and(g >= 0, g < H)
            slabs = [xt_ref[rr + u] for u in range(3)]   # (2CP, Wh)
            e = jnp.stack([s[0:CP] for s in slabs])
            o = jnp.stack([s[CP:2 * CP] for s in slabs])
            y1_ref[rr, pl.ds(0, 64), :] = conv_row(
                e, o, w1_ref, b1_ref, CP, row_ok, 0)
            y1_ref[rr, pl.ds(64, 64), :] = conv_row(
                e, o, w1_ref, b1_ref, CP, row_ok, 1)
            return 0

        jax.lax.fori_loop(0, R + 2, body1, 0)

        # ---- conv1_2 + pool: R conv rows -> TR pooled rows ----
        true_ = jnp.bool_(True)

        def body2(r2, _):
            vpe = vpo = None
            for dr in range(2):
                rr2 = 2 * r2 + dr
                slabs = [y1_ref[rr2 + u] for u in range(3)]
                e = jnp.stack([s[0:64] for s in slabs])
                o = jnp.stack([s[64:128] for s in slabs])
                ye = conv_row(e, o, w2_ref, b2_ref, 64, true_, 0)
                yo = conv_row(e, o, w2_ref, b2_ref, 64, true_, 1)
                vpe = ye if vpe is None else jnp.maximum(vpe, ye)
                vpo = yo if vpo is None else jnp.maximum(vpo, yo)
            hp = jnp.maximum(vpe, vpo)                   # (64, Wh)
            out_ref[0, r2] = hp.T[0:W2]                  # (W2, 64)
            return 0

        jax.lax.fori_loop(0, TR, body2, 0)

    in_specs = [
        pl.BlockSpec((1, R, 2 * CP, Wh),
                     lambda b, rt: (b, jnp.maximum(rt - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, 2 * CP, Wh),
                     lambda b, rt: (b, rt, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, 2 * CP, Wh),
                     lambda b, rt: (b, rt + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((64, K1), lambda b, rt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 1), lambda b, rt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 576), lambda b, rt: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 1), lambda b, rt: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, TR, W2, 64),
                             lambda b, rt: (b, rt, 0, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, nrt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((R + 4, 2 * CP, Wh), jnp.bfloat16),  # haloed input
            pltpu.VMEM((R + 2, 128, Wh), jnp.bfloat16),  # y1 even|odd rows
            pltpu.VMEM((576, Wh), jnp.bfloat16),         # shared im2col
        ],
        interpret=interpret,
    )(xt, xt, xt, w1f, b1c, w2f, b2c)


def stem_tile_rows(H2):
    """Largest tile_rows <= 10 dividing H2 (300 -> 10, 192 -> 8)."""
    for tr in range(10, 0, -1):
        if H2 % tr == 0:
            return tr
    return 1
