"""VGG16 trunk (stride-8 detection variant) as pure functions over a
name-keyed param pytree.

Matches the reference graph exactly (lib/networks/MV3D_train.py:44-78):
13 SAME 3x3 convs + ReLU, only THREE 2x2/2 VALID max-pools (stride 8, the
classic VGG16's pool4/pool5 are dropped), so BEV 601x601 -> 75x75 features.

Params are a flat dict {layer_name: {'weights': (3,3,cin,cout) HWIO,
'biases': (cout,)}} with the reference's exact layer names (conv1_1 ...
conv5_3, image trunk suffixed `_2`), so the reference's .npy pretrained
checkpoints import 1:1 (see utils/weights.py).
"""

import jax
import jax.numpy as jnp

# (name, out_channels, pool_after) — pool follows conv1_2, conv2_2, conv3_3
VGG_LAYERS = (
    ("conv1_1", 64, False), ("conv1_2", 64, True),
    ("conv2_1", 128, False), ("conv2_2", 128, True),
    ("conv3_1", 256, False), ("conv3_2", 256, False), ("conv3_3", 256, True),
    ("conv4_1", 512, False), ("conv4_2", 512, False), ("conv4_3", 512, False),
    ("conv5_1", 512, False), ("conv5_2", 512, False), ("conv5_3", 512, False),
)

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b, stride=1, padding="SAME", relu=True, dtype=None):
    """TF-parity conv + bias (+ ReLU). network.py:108-132.

    dtype=None keeps f32 with HIGHEST precision (parity mode); passing
    bfloat16 uses the MXU's native reduced-precision path (fast mode).
    """
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
        b = b.astype(dtype)
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DIMS, precision=precision)
    y = y + b
    return jax.nn.relu(y) if relu else y


def max_pool_2x2_valid(x):
    """2x2 stride-2 VALID max pool (network.py:181-188, models use VALID).

    Implemented as slice-to-even + reshape + max instead of
    lax.reduce_window: identical semantics (VALID drops the trailing
    odd row/col), reliably differentiable in every dtype (reduce_window's
    bf16 VJP fails in this jax version), and fuses well.
    """
    b, h, w, c = x.shape
    x = x[:, :2 * (h // 2), :2 * (w // 2), :]
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def init_trunk(key, in_channels, suffix=""):
    """Truncated-normal(0, 0.01) weights, zero biases (network.py:117-118)."""
    params = {}
    c_in = in_channels
    for name, c_out, _ in VGG_LAYERS:
        key, k = jax.random.split(key)
        w = jax.random.truncated_normal(k, -2.0, 2.0,
                                        (3, 3, c_in, c_out), jnp.float32) * 0.01
        params[name + suffix] = {"weights": w,
                                 "biases": jnp.zeros((c_out,), jnp.float32)}
        c_in = c_out
    return params


def trunk_apply(params, x, suffix="", dtype=None, fused_stem=False,
                stem_impl=None):
    """Run the 13-conv stride-8 trunk. Returns conv5_3 features (NHWC).

    stem_impl selects how conv1_1+conv1_2+pool1 run:
      None/"literal" — plain XLA convs (parity mode, differentiable);
      "pallas"       — one Pallas VMEM kernel (inference-only, no VJP;
                       ops/vgg_stem_pallas.py); fused_stem=True is the
                       legacy alias. Requires dtype=bfloat16 on TPU.
      "s2d"          — space-to-depth packed XLA convs (MXU-full
                       256-lane dots, differentiable; ops/stem_s2d.py).
      "s2d_fused"    — the s2d stem as ONE Pallas VMEM kernel (single
                       HBM pass, inference-only; ops/stem_s2d_pallas.py).
    """
    if fused_stem and stem_impl is None:
        stem_impl = "pallas"
    if stem_impl not in (None, "literal", "pallas", "s2d", "s2d_fused"):
        raise ValueError(
            "unknown stem_impl {!r} for the float trunk (the s2d_int8 "
            "stem lives in quant.extract_features_int8)".format(stem_impl))
    layers = VGG_LAYERS
    if stem_impl == "pallas":
        from mv3d_tf_tpu.ops.vgg_stem_pallas import (stem_tile_rows,
                                                     vgg_stem_pallas)
        p1 = params["conv1_1" + suffix]
        p2 = params["conv1_2" + suffix]
        x = vgg_stem_pallas(x, p1["weights"], p1["biases"],
                            p2["weights"], p2["biases"],
                            tile_rows=stem_tile_rows(x.shape[1] // 2))
        layers = VGG_LAYERS[2:]
    elif stem_impl == "s2d":
        from mv3d_tf_tpu.ops.stem_s2d import stem_s2d
        p1 = params["conv1_1" + suffix]
        p2 = params["conv1_2" + suffix]
        x = stem_s2d(x, p1["weights"], p1["biases"],
                     p2["weights"], p2["biases"], dtype=dtype)
        layers = VGG_LAYERS[2:]
    elif stem_impl == "s2d_fused":
        from mv3d_tf_tpu.ops.stem_s2d_pallas import stem_s2d_fused
        p1 = params["conv1_1" + suffix]
        p2 = params["conv1_2" + suffix]
        x = stem_s2d_fused(x, p1["weights"], p1["biases"],
                           p2["weights"], p2["biases"],
                           dtype=dtype or jnp.float32)
        layers = VGG_LAYERS[2:]
    for name, _, pool in layers:
        p = params[name + suffix]
        x = conv2d(x, p["weights"], p["biases"], dtype=dtype)
        if pool:
            x = max_pool_2x2_valid(x)
    return x
