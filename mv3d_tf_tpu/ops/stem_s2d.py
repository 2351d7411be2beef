"""Space-to-depth VGG stem: conv1_1 + ReLU + conv1_2 + ReLU + pool1 with
MXU-full 256-channel convs at half resolution.

Why: the literal stem runs two 3x3 convs at FULL input resolution with
64 output channels — half the MXU's 128 lanes idle, and the conv1_1
contraction is only 9*Cin (Cin = 9 BEV / 3 image). Measured round 1-2:
~18 ms/batch-8 against a ~2.7 ms roofline, the single worst stage in the
detector. Packing 2x2 pixel blocks into channels ("space-to-depth")
rewrites the SAME math as:

  conv1_1:  4x4 stride-2 conv, Cin -> 4*64 = 256   (at (H/2+1)^2)
  conv1_2:  2x2 VALID conv, 256 -> 256             (at (H/2+1)^2)
  pool1:    max over the 4 subpixel channel groups (at (H/2)^2)

The key layout choice is the SHIFTED packing: Y1 block p holds conv1_1
output rows {2p-1, 2p} (cols likewise). A 3x3 window around any output
pixel of conv1_2 then spans exactly TWO shifted blocks per axis, so the
packed conv1_2 kernel is 2x2 (16/9 tap redundancy) instead of the 3x3
(36/9) a block-aligned packing would need. Out-of-range rows that the
shifted packing materializes (y1 row -1; row H on even H) are zeroed
after the ReLU so they reproduce conv1_2's zero SAME-padding exactly.

Each multiply-add of the literal stem appears exactly once (plus
exact-zero taps), so f32/HIGHEST output is bit-tight to the literal stem
up to f32 summation order; bf16 differs by normal reduction-order noise
(tests/test_stem_s2d.py pins both).

FLOP cost is 16/9 of the literal stem, but every dot is 256-lane dense:
net ~1.6-3x faster under XLA, and the 256-channel conv1_2 is also a
legal shape for the int8 Pallas conv kernels (ops/conv_s8_pallas.py),
which the 64-channel literal layout is not (128-lane alignment).

Reference lineage: stem = lib/networks/MV3D_train.py:44-48 (conv1_1,
conv1_2, pool1); this packing is a TPU-native reformulation, not a
reference pattern.
"""

import functools

import jax
import jax.numpy as jnp


def pack_stem_weights(w1, b1, w2, b2):
    """Remap literal stem weights to the s2d layout.

    Args:
      w1: (3, 3, Cin, C1) conv1_1 HWIO weights.
      b1: (C1,) conv1_1 bias.
      w2: (3, 3, C1, C2) conv1_2 HWIO weights.
      b2: (C2,) conv1_2 bias.
    Returns:
      K1 (4, 4, Cin, 4*C1), B1 (4*C1,), K2 (2, 2, 4*C1, 4*C2),
      B2 (4*C2,). Subpixel group g = r*2 + c (row-major over the 2x2
      block) owns channels [g*C, (g+1)*C).
    """
    Cin, C1 = w1.shape[2], w1.shape[3]
    C2 = w2.shape[3]
    dt = w1.dtype

    # K1[a, b, :, g] = w1[a - r, b - c]: y1 row 2p + r - 1 tap u reads
    # x row 2p - 2 + (r + u), so kernel offset a = r + u.
    K1 = jnp.zeros((4, 4, Cin, 4 * C1), dt)
    for r in range(2):
        for c in range(2):
            g = r * 2 + c
            for a in range(4):
                for b in range(4):
                    u, v = a - r, b - c
                    if 0 <= u < 3 and 0 <= v < 3:
                        K1 = K1.at[a, b, :, g * C1:(g + 1) * C1].set(
                            w1[u, v])
    B1 = jnp.tile(b1, 4)

    # K2[P, Q, gin, gout] = w2[2P + r - di, 2Q + c - dj]: y2 row
    # 2i + di tap u reads y1 row 2i + di + u - 1 = shifted block
    # (i + P) row r with di + u - 1 = 2P + r - 1.
    K2 = jnp.zeros((2, 2, 4 * C1, 4 * C2), dt)
    for P in range(2):
        for Q in range(2):
            for r in range(2):
                for c in range(2):
                    gi = r * 2 + c
                    for di in range(2):
                        for dj in range(2):
                            go = di * 2 + dj
                            u, v = 2 * P + r - di, 2 * Q + c - dj
                            if 0 <= u < 3 and 0 <= v < 3:
                                K2 = K2.at[
                                    P, Q, gi * C1:(gi + 1) * C1,
                                    go * C2:(go + 1) * C2].set(w2[u, v])
    B2 = jnp.tile(b2, 4)
    return K1, B1, K2, B2


def _mask_edges(y, H, W, C1):
    """Zero packed entries that map outside y1's [0,H)x[0,W) range so
    they act as conv1_2's zero SAME-padding (r=0/c=0 at block 0 is
    y1 row/col -1; r=1/c=1 at the last block is row/col H on even H).

    Built as ONE fused iota-select rather than a chain of .at[].set:
    each dynamic-update-slice in that chain compiled to a full copy of
    the ~400 MB packed intermediate on TPU (r3 HLO inspection) — most of
    the stem's 21.3-vs-7.7 ms roofline gap lived here."""
    Hb, Wb, C = y.shape[1], y.shape[2], y.shape[3]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, Hb, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wb, 1), 2)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, C), 3)
    # r = 0 groups at block 0 (y1 row -1): g in {0, 1} = ch [0, 2*C1)
    dead = (row == 0) & (ch < 2 * C1)
    # c = 0 groups at block 0 (y1 col -1): g in {0, 2}
    dead |= (col == 0) & ((ch < C1) | ((ch >= 2 * C1) & (ch < 3 * C1)))
    if H % 2 == 0:  # r = 1 groups at block H//2 map to y1 row H
        dead |= (row == H // 2) & (ch >= 2 * C1)
    if W % 2 == 0:  # c = 1 groups at block W//2 (y1 col W): g in {1, 3}
        dead |= (col == W // 2) & (((ch >= C1) & (ch < 2 * C1))
                                   | (ch >= 3 * C1))
    return jnp.where(dead, jnp.zeros((), y.dtype), y)


@functools.partial(jax.jit, static_argnames=("dtype",))
def stem_s2d(x, w1, b1, w2, b2, dtype=None):
    """Drop-in twin of the literal conv1_1+conv1_2+pool1 stem.

    Args:
      x: (B, H, W, Cin) input (f32 or dtype).
      w1, b1, w2, b2: LITERAL stem params (remapped internally; the
        remap is differentiable, so this is train-legal too).
      dtype: None = f32 HIGHEST (parity mode); jnp.bfloat16 = fast.
    Returns:
      (B, H//2, W//2, C2) pooled conv1_2 features.
    """
    B, H, W, _ = x.shape
    C1, C2 = w1.shape[3], w2.shape[3]
    Ho, Wo = H // 2, W // 2
    K1, B1, K2, B2 = pack_stem_weights(w1, b1, w2, b2)
    if dtype is not None:
        x, K1, B1, K2, B2 = (t.astype(dtype) for t in (x, K1, B1, K2, B2))
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    # shifted-packed conv1_1: block p row r = y1 row 2p + r - 1; block p
    # needs x rows [2p - 2, 2p + 2), so pad 2 low and 2*Ho + 2 - H high
    # for blocks p in [0, Ho + 1)
    y = jax.lax.conv_general_dilated(
        x, K1, window_strides=(2, 2),
        padding=((2, 2 * Ho + 2 - H), (2, 2 * Wo + 2 - W)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = jax.nn.relu(y + B1)
    y = _mask_edges(y, H, W, C1)

    # packed conv1_2: out block i uses shifted blocks {i, i+1} — VALID
    # 2x2 over (Ho+1) blocks gives exactly Ho
    z = jax.lax.conv_general_dilated(
        y, K2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    z = jax.nn.relu(z + B2)

    # pool1 = max over the 4 subpixel groups — as an elementwise max of
    # channel-block slices, not reshape+reduce_max: XLA assigns
    # reduce_max a layout ({2,3,1,0}) incompatible with the convs'
    # ({3,0,2,1}) and brackets it with full-tensor layout copies
    # (~12.8 ms/b32 on the int8 twin, trace_knee_b32.log). Slices +
    # jnp.maximum fuse layout-free. Forward is bit-identical; the VJP
    # differs only on 3-way ties (pairwise tournament splits 1/4,1/4,
    # 1/2 vs reduce_max's even 1/3 — measure-zero, mass-conserving).
    m = z[..., 0 * C2:1 * C2]
    for g in range(1, 4):
        m = jnp.maximum(m, z[..., g * C2:(g + 1) * C2])
    return m
