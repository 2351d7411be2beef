"""Single-pass Pallas TPU kernel for the space-to-depth VGG stem.

ops/stem_s2d.py expresses conv1_1+ReLU+conv1_2+ReLU+pool1 as two XLA
convs in the shifted-packed layout; measured r3 that costs 21.3 ms/batch-8
against a ~7.7 ms bf16 compute roofline (profile_stages --int8) because
the two ~870 MB half-resolution 256-channel intermediates round-trip HBM
(plus the edge-mask dynamic-update-slices). This kernel runs the whole
stem per row-tile inside VMEM:

  HBM reads:  the im2col'd input columns once (+1/TZ tile overlap),
              the packed weights (resident across the grid);
  HBM writes: the pooled (B, H/2, W/2, C2) output once.

Math is IDENTICAL to stem_s2d (same pack_stem_weights remap, same
shifted-block semantics, same edge masking = conv1_2's zero SAME
padding), so it inherits the bit-tightness argument there; bf16 differs
from the XLA version only by f32-accumulator partial-sum order (conv1_2
is 4 accumulated dots instead of one conv).

Per grid step (one batch frame x TZ output rows):
  y  = relu(Xcols @ W1 + B1)          one (TZ+1)*(Wo+1) x K x 4C1 dot
  y  = mask_edges(y)                  iota select, VPU
  z  = relu(sum_PQ y[P:,Q:] @ W2[PQ]) four TZ*Wo x 4C1 x 4C2 dots (MXU
                                      dense: K = N = 256 for VGG)
  out= max over the 4 subpixel groups (pool1)

Reference lineage: the stem is lib/networks/MV3D_train.py:44-48; the
packing is TPU-native (see ops/stem_s2d.py docstring). Inference fast
path only — not differentiable (train uses stem_s2d, which is).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mv3d_tf_tpu.ops.stem_s2d import pack_stem_weights


def _round_up(x, m):
    return -(-x // m) * m


def _widths(W):
    """Aligned working widths: all kernel-side (rows, cols) -> (rows*cols)
    flattens need cols % 8 == 0 (Mosaic rejects the shape cast otherwise
    — 'infer-vector-layout: unsupported shape cast', found on-chip r3).
    Wq is the flattened conv1_2/output column count; Wyp the padded y /
    x-cols width so the Q=1 shifted slice [1, 1+Wq) stays in range."""
    Wo = W // 2
    Wq = _round_up(Wo, 8)
    Wyp = Wq + 8
    return Wo, Wq, Wyp


def stem_tile_rows(H, W, Cin, C1=64, C2=64, budget=11 * 1024 * 1024,
                   io_bytes=2):
    """Pick the row-tile TZ: the largest divisor of Ho=H//2 whose VMEM
    working set fits the budget. The byte model mirrors the kernel's
    actual buffers (double-buffered xa+xb blocks, the y value, the f32
    conv1_2 accumulator, double-buffered out block, resident weights) —
    tests/test_stem_s2d_pallas.py asserts the fit for shipping shapes."""
    Ho = H // 2
    Wo, Wq, Wyp = _widths(W)
    K = 16 * Cin
    k_lanes = _round_up(K, 128)
    c1q = 4 * C1
    c2_lanes = _round_up(C2, 128)
    best = None
    for tz in range(1, min(Ho, 32) + 1):
        if Ho % tz:
            continue
        xa_xb = 2 * 2 * tz * Wyp * k_lanes * io_bytes
        y = (tz + 1) * Wyp * c1q * io_bytes
        z = tz * Wq * c1q * 4
        out = 2 * tz * _round_up(Wo, 8) * c2_lanes * io_bytes
        w = (k_lanes * c1q + 4 * c1q * c1q) * io_bytes + 2 * c1q * 4
        if xa_xb + y + z + out + w <= budget:
            best = tz
    if best is None:
        raise ValueError("no row tile fits VMEM for stem shape "
                         f"H={H} W={W} Cin={Cin}")
    return best


def _pack_input_cols(x, TZ):
    """x (B, H, W, Cin) -> im2col'd conv1_1 inputs (B, Ho+TZ, Wyp, 16*Cin).

    Column layout [(P*2+Q)*4*Cin + (r*2+c)*Cin + ci] matches
    _pack_w1_mat: block (P,Q) of the 2x2 shifted-block window, subpixel
    (r,c) within the block. Rows are padded from Ho+1 to Ho+TZ so the
    lookahead BlockSpec (tile t also maps tile t+1's block for its first
    row) stays in range at the last tile; columns are zero-padded from
    Wo+1 to the 8-aligned Wyp (see _widths — the pad y columns only feed
    output columns >= Wo, which the store slice discards).
    """
    B, H, W, Cin = x.shape
    Ho, Wo = H // 2, W // 2
    _, _, Wyp = _widths(W)
    Hp, Wp = Ho + 2, Wo + 2
    xp = jnp.pad(x, ((0, 0), (2, 2 * Ho + 2 - H), (2, 2 * Wo + 2 - W),
                     (0, 0)))
    blk = xp.reshape(B, Hp, 2, Wp, 2, Cin).transpose(0, 1, 3, 2, 4, 5)
    blk = blk.reshape(B, Hp, Wp, 4 * Cin)
    cols = jnp.concatenate(
        [blk[:, :-1, :-1], blk[:, :-1, 1:], blk[:, 1:, :-1], blk[:, 1:, 1:]],
        axis=-1)                                    # (B, Ho+1, Wo+1, 16Cin)
    return jnp.pad(cols, ((0, 0), (0, TZ - 1), (0, Wyp - (Wo + 1)),
                          (0, 0)))


def _pack_w1_mat(K1):
    """K1 (4, 4, Cin, 4*C1) [pack_stem_weights] -> (16*Cin, 4*C1) matmul
    form in the _pack_input_cols column order: kernel offset a = 2P + r,
    b = 2Q + c."""
    Cin, CO = K1.shape[2], K1.shape[3]
    w = K1.reshape(2, 2, 2, 2, Cin, CO)             # (P, r, Q, c, ci, co)
    return w.transpose(0, 2, 1, 3, 4, 5).reshape(16 * Cin, CO)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def stem_s2d_fused(x, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=False):
    """Fused drop-in twin of ops/stem_s2d.stem_s2d (inference fast path).

    Args:
      x: (B, H, W, Cin) input (f32 or dtype).
      w1, b1, w2, b2: LITERAL stem params (remapped internally).
      dtype: kernel io/compute dtype (dots accumulate f32 regardless).
    Returns:
      (B, H//2, W//2, C2) pooled conv1_2 features, dtype.
    """
    B, H, W, Cin = x.shape
    C1, C2 = w1.shape[3], w2.shape[3]
    Ho = H // 2
    Wo, Wq, Wyp = _widths(W)
    C1q = 4 * C1
    TZ = stem_tile_rows(H, W, Cin, C1, C2,
                        io_bytes=jnp.dtype(dtype).itemsize)
    T = Ho // TZ

    K1, B1, K2, B2 = pack_stem_weights(w1, b1, w2, b2)
    w1m = _pack_w1_mat(K1).astype(dtype)            # (16Cin, 4C1)
    w2m = K2.reshape(4, C1q, 4 * C2).astype(dtype)  # (PQ, 4C1, 4C2)
    b1m = B1.reshape(1, C1q).astype(jnp.float32)
    b2m = B2.reshape(1, 4 * C2).astype(jnp.float32)
    xc = _pack_input_cols(x.astype(dtype), TZ)      # (B, Ho+TZ, Wyp, 16Cin)
    Kd = xc.shape[-1]

    # edge-mask channel predicates (ops/stem_s2d._mask_edges semantics)
    mask_last_row = (H % 2 == 0)
    mask_last_col = (W % 2 == 0)

    def kernel(xa_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        t = pl.program_id(1)
        row0 = t * TZ

        # every (rows, cols, C) -> (rows*cols, C) flatten below uses an
        # 8-ALIGNED cols (Wyp, Wq) — Mosaic rejects the shape cast
        # otherwise (the r3 on-chip finding; cf. conv_s8_pallas v2's Wt)
        def conv1(xv, rows):
            y = jnp.dot(xv.reshape(rows * Wyp, Kd), w1_ref[...],
                        preferred_element_type=jnp.float32)
            return jnp.maximum(y + b1_ref[...], 0.0).reshape(rows, Wyp, C1q)

        y_main = conv1(xa_ref[0], TZ)               # y rows row0..row0+TZ-1
        y_last = conv1(xb_ref[0, 0:1], 1)           # y row  row0+TZ
        y = jnp.concatenate([y_main, y_last], axis=0)   # (TZ+1, Wyp, 4C1)

        # conv1_2's zero SAME-padding: zero the packed entries mapping
        # outside y1's [0,H)x[0,W) (see stem_s2d._mask_edges); pad
        # columns (col > Wo) only ever reach discarded output columns
        row = (jax.lax.broadcasted_iota(jnp.int32, (TZ + 1, 1, 1), 0)
               + row0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Wyp, 1), 1)
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C1q), 2)
        dead = (row == 0) & (ch < 2 * C1)
        dead |= (col == 0) & ((ch < C1) | ((ch >= 2 * C1) & (ch < 3 * C1)))
        if mask_last_row:
            dead |= (row == Ho) & (ch >= 2 * C1)
        if mask_last_col:
            dead |= (col == Wo) & (((ch >= C1) & (ch < 2 * C1))
                                   | (ch >= 3 * C1))
        y = jnp.where(dead, 0.0, y).astype(dtype)

        z = None
        for P in range(2):
            yp = y[P:P + TZ]
            for Q in range(2):
                ypq = yp[:, Q:Q + Wq, :].reshape(TZ * Wq, C1q)
                d = jnp.dot(ypq, w2_ref[P * 2 + Q],
                            preferred_element_type=jnp.float32)
                z = d if z is None else z + d
        z = jnp.maximum(z + b2_ref[...], 0.0)       # (TZ*Wq, 4C2)

        pooled = jnp.maximum(
            jnp.maximum(z[:, 0:C2], z[:, C2:2 * C2]),
            jnp.maximum(z[:, 2 * C2:3 * C2], z[:, 3 * C2:4 * C2]))
        out_ref[0] = pooled.reshape(TZ, Wq, C2)[:, :Wo].astype(dtype)

    grid_spec = pl.GridSpec(
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, TZ, Wyp, Kd), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # lookahead block: only its first row (y row (t+1)*TZ) is
            # read; costs one extra fetch of each x-cols block but keeps
            # the tiling pure BlockSpec (no manual DMA)
            pl.BlockSpec((1, TZ, Wyp, Kd), lambda b, t: (b, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kd, C1q), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C1q), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C1q, 4 * C2), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C2), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TZ, Wo, C2), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C2), dtype),
        interpret=interpret,
    )(xc, xc, w1m, b1m, w2m, b2m)
