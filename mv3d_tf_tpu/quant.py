"""Post-training int8 quantization for the inference hot path.

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate, and the VGG
trunks are ~2/3 of the fused inference program (PROGRESS.md stage
profile), so int8 trunks are the single biggest lever toward the 500
fps north star (VERDICT r1 next-round #1). This module implements
standard static PTQ:

  * weights: per-output-channel symmetric int8
    (scale_c = max|w[..., c]| / 127);
  * activations: per-tensor symmetric int8 from a calibration pass
    (scale = max|activation| / 127 over N frames); every trunk
    activation is post-ReLU so the int8 range is effectively [0, 127];
  * conv: s32 accumulate, dequant (s_in * s_w_c) + bias in f32, ReLU,
    requantize for the next layer — requant chains fuse into the conv
    epilogue under XLA, the MXU sees pure s8 operands;
  * 2x2 max pools run directly on int8 (max commutes with the monotone
    quantization map) — halves pool bandwidth too.

The reference has no quantization (TF 1.0 f32 everywhere); this is a
new capability the TPU target motivates, gated behind an explicit flag
so parity mode stays bf16/f32.

Accuracy gate (tools/quant_check.py + tests/test_quant.py): detections
on synthetic frames must match the bf16 path within AP noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu.models import vgg

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv_s8(x_q, w_q, stride=1, padding="SAME"):
    """s8 x s8 -> s32 convolution on the MXU."""
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DIMS, preferred_element_type=jnp.int32)


def _conv_s8_dots(x_q, w_q):
    """3x3 SAME stride-1 s8 conv as 9 shifted s8 matmuls (s32 accumulate).

    Rationale (microbench_int8, TPU v5e): XLA's s8 dot_general sustains
    ~198 TOP/s while its s8 conv lowering reaches only 85-114 TOP/s —
    reformulating the conv as sum_{dy,dx} shift(x)[HW,Cin] @ w[dy,dx]
    rides the fast dot path. Bit-identical to _conv_s8 (integer math).
    """
    B, H, W, C = x_q.shape
    kh, kw, _, K = w_q.shape
    assert (kh, kw) == (3, 3)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * H * W, K), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, C)
            acc = acc + jax.lax.dot_general(
                xs, w_q[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    return acc.reshape(B, H, W, K)


def _conv_s8_im2col(x_q, w_q):
    """3x3 SAME stride-1 s8 conv as ONE (B*H*W, 9*Cin) @ (9*Cin, K) s8
    matmul.

    The _conv_s8_dots 9-dot form pays up to 9 s32-accumulator HBM
    round-trips over the full-res intermediate (4 bytes/elem, the
    dominant traffic at conv2/conv3 resolution). Stacking the shifted
    inputs along the CONTRACTION dim instead materializes one 9x s8
    im2col tensor — 9*Cin bytes/pixel, i.e. ~half the bytes of a single
    s32 accumulator pass at K=Cin — and runs a single dot on the same
    ~198 TOP/s s8 dot path with one accumulator. Bit-identical to
    _conv_s8 (integer math, identical (dy, dx, ci) contraction order).
    """
    B, H, W, C = x_q.shape
    kh, kw, _, K = w_q.shape
    assert (kh, kw) == (3, 3)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + H, dx:dx + W, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    return jax.lax.dot_general(
        cols.reshape(B * H * W, 9 * C), w_q.reshape(9 * C, K),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(B, H, W, K)


def quantize_weights(w):
    """(3,3,cin,cout) f32 -> (int8 weights, (cout,) f32 scales)."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return w_q, scale


def calibrate_trunk(params, frames, suffix=""):
    """Per-layer activation scales from a calibration batch.

    frames: (B, H, W, C) input batch (BEV or image, already
    mean-subtracted for the image trunk). Runs the bf16 trunk as ONE
    jitted program that returns every layer's max|activation| (13
    separate dispatches would each pay a device-tunnel compile).

    Returns {"__input__": s_in, layer_name: s_out, ...} float scales
    (max/127).
    """
    @jax.jit
    def maxes(p, x):
        out = {"__input__": jnp.max(jnp.abs(x))}
        x = x.astype(jnp.bfloat16)
        for name, _, pool in vgg.VGG_LAYERS:
            lp = p[name + suffix]
            x = vgg.conv2d(x, lp["weights"], lp["biases"],
                           dtype=jnp.bfloat16)
            if pool:
                x = vgg.max_pool_2x2_valid(x)
            out[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return out

    m = jax.tree.map(float, jax.device_get(maxes(params,
                                                 jnp.asarray(frames))))
    return {k: v / 127.0 for k, v in m.items()}


def quantize_trunk(params, act_scales, suffix=""):
    """Build the int8 trunk param pytree.

    Returns {layer: {w_q int8, bias f32, s_w (cout,) f32, s_in f32,
    s_out f32}} keyed WITHOUT the suffix.
    """
    q = {}
    s_in = float(act_scales["__input__"])
    for name, _, _ in vgg.VGG_LAYERS:
        p = params[name + suffix]
        w_q, s_w = quantize_weights(p["weights"])
        q[name] = {
            "w_q": jnp.asarray(w_q),
            "bias": jnp.asarray(np.asarray(p["biases"], np.float32)),
            "s_w": jnp.asarray(s_w),
            "s_in": jnp.float32(s_in),
            "s_out": jnp.float32(act_scales[name]),
        }
        s_in = float(act_scales[name])
    return q


def _conv_requant(x, p, impl="xla"):
    """One int8 conv + FOLDED requant epilogue.

    Mathematically identical to dequant -> +bias -> ReLU -> /s_out ->
    round -> clip, but as a single FMA on the s32 accumulator
    (k = s_in*s_w/s_out, b' = bias/s_out) with ReLU folded into the
    0-clamp — fewer VPU passes over the full-res intermediate, which is
    where the epilogue cost lives at conv1/conv2 resolution.
    """
    if impl == "xla" and jax.default_backend() == "cpu":
        # XLA:CPU's s8 conv lowering is ~400x slower than its s8
        # dot_general (4.9 s vs 0.01 s per 40x40x256 conv, measured) —
        # the CPU test tier was spending minutes per int8 detector
        # execution. The formulations are bit-identical (integer math,
        # tests/test_quant.py equality tests), so the CPU path rides
        # im2col; TPU keeps the true lax.conv lowering.
        impl = "im2col"
    conv = {"xla": _conv_s8, "dots": _conv_s8_dots,
            "im2col": _conv_s8_im2col}[impl]
    y32 = conv(x, p["w_q"])
    k = (p["s_in"] * p["s_w"] / p["s_out"]).astype(jnp.float32)
    b = (p["bias"] / p["s_out"]).astype(jnp.float32)
    y = y32.astype(jnp.float32) * k + b
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def trunk_apply_int8(qtrunk, x, input_scale=None):
    """Run the 13-conv stride-8 trunk fully in int8.

    x: float input (B,H,W,C) — quantized with the calibration input
    scale; or an ALREADY-QUANTIZED int8 tensor (then input_scale must
    equal the scale it was quantized with, e.g. the stem path).

    Returns (feat_int8 (B,h,w,512), s_feat): the conv5_3 activations in
    int8 plus their scale — the ROI pool consumes int8 directly (max
    pooling commutes with quantization) and the fusion head dequantizes.
    """
    first = vgg.VGG_LAYERS[0][0]
    if x.dtype != jnp.int8:
        s = qtrunk[first]["s_in"]
        x = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                     -127, 127).astype(jnp.int8)
    for name, _, pool in vgg.VGG_LAYERS:
        x = _conv_requant(x, qtrunk[name])
        if pool:
            x = vgg.max_pool_2x2_valid(x)
    return x, qtrunk[vgg.VGG_LAYERS[-1][0]]["s_out"]


# Layers the "hybrid" conv impl routes to the fused Pallas kernel: the
# big-feature-map half of the trunk (conv2 at stride 2, conv3 at stride
# 4), where the r4 trace attributes the bulk of the ~29 ms/b16
# requant-boundary class (each XLA s8 conv materializes its s32
# accumulator to HBM and a separate clamp_convert fusion re-reads it —
# ~9 bytes/elem of boundary traffic vs the kernel's fused in-VMEM
# epilogue writing 1). conv4/conv5 (stride 8, 16x fewer pixels) stay on
# XLA, whose raw s8 rate (210 TOP/s) beats the kernel's and whose
# boundary cost is proportionally small — the r4 all-pallas A/B lost 21
# fps precisely because the kernel's small-M 75x75 grid steps run far
# below its large-shape rate (PERF.md r4 lever outcomes).
_HYBRID_PALLAS_LAYERS = ("conv2_1", "conv2_2",
                         "conv3_1", "conv3_2", "conv3_3")


def _conv_requant_pallas_padded(x, p, pad_to=128):
    """conv_requant_pallas for layers whose input channel count is below
    the s8 MXU lane tile (conv2_1: 64): zero-pad x and the weight's
    input-channel rows to 128 — bit-exact (zero taps contribute zero to
    the s32 accumulator) at 2x the (boundary-dominated) layer's MACs."""
    from mv3d_tf_tpu.ops.conv_s8_pallas import conv_requant_pallas
    cin = x.shape[-1]
    pc = pad_to - cin
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pc)))
    pp = dict(p)
    pp["w_q"] = jnp.pad(p["w_q"], ((0, 0), (0, 0), (0, pc), (0, 0)))
    return conv_requant_pallas(xp, pp, tile_rows=_s8_tile_rows(
        xp.shape[1], W=xp.shape[2], C=pad_to, K=p["w_q"].shape[3]))


def trunk_apply_int8_from_stem(qtrunk, stem_out_bf16, conv_impl="xla"):
    """Continue the int8 trunk from a bf16 stem output (conv1_2+pool1
    already applied): quantize with conv1_2's output scale and run
    conv2_1 .. conv5_3.

    conv_impl="pallas" runs every conv whose channel dims are multiples
    of the s8 MXU tile (128 — all but conv2_1's 64-channel input)
    through the fused Pallas kernel (ops/conv_s8_pallas.py); "hybrid"
    routes only _HYBRID_PALLAS_LAYERS (incl. a channel-padded conv2_1)
    to the kernel and keeps conv4/conv5 on XLA; "xla" is the lax.conv
    path. All compute the identical _conv_requant math bit-for-bit.
    """
    s = qtrunk["conv1_2"]["s_out"]
    x = jnp.clip(jnp.round(stem_out_bf16.astype(jnp.float32) / s),
                 0, 127).astype(jnp.int8)
    return _trunk_tail_int8(qtrunk, x, conv_impl)


def _trunk_tail_int8(qtrunk, x, conv_impl):
    """conv2_1 .. conv5_3 on an s8 input — the shared tail behind both
    from-stem entry points; see trunk_apply_int8_from_stem for the
    conv_impl vocabulary."""
    for name, _, pool in vgg.VGG_LAYERS[2:]:
        p = qtrunk[name]
        cin, cout = p["w_q"].shape[2], p["w_q"].shape[3]
        use_pallas = (
            (conv_impl == "pallas" and cin % 128 == 0 and cout % 128 == 0)
            or (conv_impl == "hybrid" and name in _HYBRID_PALLAS_LAYERS))
        if use_pallas:
            if cin % 128 != 0:
                x = _conv_requant_pallas_padded(x, p)
            else:
                from mv3d_tf_tpu.ops.conv_s8_pallas import \
                    conv_requant_pallas
                x = conv_requant_pallas(x, p, tile_rows=_s8_tile_rows(
                    x.shape[1], W=x.shape[2], C=cin, K=cout))
        elif conv_impl in ("dots", "im2col"):
            x = _conv_requant(x, p, impl=conv_impl)
        else:
            x = _conv_requant(x, p)
        if pool:
            x = vgg.max_pool_2x2_valid(x)
    return x, qtrunk[vgg.VGG_LAYERS[-1][0]]["s_out"]


def _s8_tile_rows(H, W=None, C=256, K=256):
    """Rows per Pallas conv grid step: a divisor keeps the row grid
    exact (no wasted tail compute); prefer ~8.

    With W given, also bound the kernel's scoped-VMEM stack: the s32
    accumulator + f32 requant intermediate cost ~2*TH*W*K*4 bytes and
    the shifted-input scratch (TH+2)*W*3C — at the image view's 624-px
    rows TH=8 exceeds the 16 MB scoped limit (measured: 18.57M), so
    cap TH to fit a 12 MB budget before picking the divisor."""
    cap = None
    if W is not None:
        wt = -(-W // 8) * 8
        per_row = 2 * wt * K * 4 + wt * 3 * C + 4 * wt * C
        cap = max(2, int((12 * 1024 * 1024 - 2 * wt * 3 * C) // per_row))
    for tr in (8, 10, 6, 12, 5, 4, 9, 7, 3, 2):
        if H % tr == 0 and (cap is None or tr <= cap):
            return tr
    return min(8, cap) if cap is not None else 8


# ---------------------------------------------------------------------------
# Fusion head (fc6/fc7 per view + cls/bbox) in int8
# ---------------------------------------------------------------------------

def calibrate_head(params, pooled_bv, pooled_img):
    """Activation scales for the fc stack from calibration ROI features
    (bf16 reference forward, mv3d.fusion_head structure)."""
    from mv3d_tf_tpu.models import mv3d

    def amax(a):
        return float(jnp.max(jnp.abs(a)))

    scales = {}
    x1 = pooled_bv.reshape(pooled_bv.shape[0], -1).astype(jnp.bfloat16)
    x2 = pooled_img.reshape(pooled_img.shape[0], -1).astype(jnp.bfloat16)
    scales["pooled_bv"] = amax(x1) / 127.0
    scales["pooled_img"] = amax(x2) / 127.0
    f1 = mv3d.fc_apply(params["fc6_1"], x1)
    scales["fc6_1"] = amax(f1) / 127.0
    f1 = mv3d.fc_apply(params["fc7_1"], f1)
    scales["fc7_1"] = amax(f1) / 127.0
    f2 = mv3d.fc_apply(params["fc6_2"], x2)
    scales["fc6_2"] = amax(f2) / 127.0
    f2 = mv3d.fc_apply(params["fc7_2"], f2)
    scales["fc7_2"] = amax(f2) / 127.0
    return scales


def quantize_head(params, head_scales):
    """int8 params for fc6/fc7 of both views; cls_score / bbox_pred stay
    bf16 (tiny matmuls, and the score head is accuracy-critical)."""
    q = {"scales": {k: jnp.float32(v) for k, v in head_scales.items()}}
    for name in ("fc6_1", "fc7_1", "fc6_2", "fc7_2"):
        w = np.asarray(params[name]["weights"], np.float32)
        s_w = np.maximum(np.abs(w).max(axis=0) / 127.0,
                         1e-12).astype(np.float32)
        q[name] = {
            "w_q": jnp.asarray(
                np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)),
            "bias": jnp.asarray(np.asarray(params[name]["biases"],
                                           np.float32)),
            "s_w": jnp.asarray(s_w),
        }
    return q


def _fc_s8(x_q, p, s_in):
    y32 = jax.lax.dot_general(x_q, p["w_q"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return jnp.maximum(
        y32.astype(jnp.float32) * (s_in * p["s_w"]) + p["bias"], 0.0)


def fusion_head_int8(params, qhead, pooled_bv_q, s_bv, pooled_img_q, s_img):
    """Int8 fc6/fc7 over int8 ROI features straight from the int8 trunk
    (pooled_*_q are int8 with trunk scales s_bv / s_img); cls/bbox heads
    run bf16 on the fused activations (mv3d.fusion_head test-graph
    semantics, MV3D_test.py:103-123 — no dropout)."""
    from mv3d_tf_tpu.models import mv3d
    sc = qhead["scales"]
    n = pooled_bv_q.shape[0]
    x1 = pooled_bv_q.reshape(n, -1)
    x2 = pooled_img_q.reshape(n, -1)

    f1 = _fc_s8(x1, qhead["fc6_1"], s_bv)
    f1 = _fc_s8(jnp.clip(jnp.round(f1 / sc["fc6_1"]), 0, 127
                         ).astype(jnp.int8), qhead["fc7_1"], sc["fc6_1"])
    f2 = _fc_s8(x2, qhead["fc6_2"], s_img)
    f2 = _fc_s8(jnp.clip(jnp.round(f2 / sc["fc6_2"]), 0, 127
                         ).astype(jnp.int8), qhead["fc7_2"], sc["fc6_2"])

    fused = jnp.concatenate([f1, f2], axis=1).astype(jnp.bfloat16)
    cls_score = mv3d.fc_apply(params["cls_score"], fused, relu=False)
    cls_prob = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    bbox_pred = mv3d.fc_apply(params["bbox_pred"], fused, relu=False)
    return cls_score, cls_prob, bbox_pred


def calibrate_pooled_features(params, bev_frames, image_frames, calib,
                              feat_h=75, feat_w=75, post_nms_top_n=300):
    """Capture ROI-pooled calibration features for the int8 head.

    Runs the bf16 pipeline (trunks -> RPN -> proposals -> ROI pool) on
    the calibration frames and returns (pooled_bv, pooled_img) with only
    the valid-proposal rows kept (invalid slots are zero and would skew
    the max-based scales toward 0 harmlessly but waste range).

    image_frames must ALREADY be mean-subtracted (same contract as
    build_quant_state).
    """
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast
    from mv3d_tf_tpu.proposals import (IMG_BOUNDS, IMG_PAD,
                                       proposal_layer_3d)
    max_img_h = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
    max_img_w = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)

    @jax.jit
    def run(p, bev, image, cal):
        B = bev.shape[0]
        c5, c5_2 = mv3d.extract_features(p, bev, image,
                                         dtype=jnp.bfloat16)
        rpn_cls, rpn_box = mv3d.rpn_head(p, c5, dtype=jnp.bfloat16)
        prob = mv3d.rpn_probs(rpn_cls)
        rois = jax.vmap(
            lambda pr, d, c: proposal_layer_3d(
                pr[None], d[None], c, feat_h, feat_w,
                pre_nms_top_n=6000, post_nms_top_n=post_nms_top_n,
                nms_thresh=0.7,
                # mirror eval.py's safe-pairing rule: this jit also runs
                # the Pallas pool, and "auto" would pick blocked NMS
                # (data-dependent while_loop) above 512 — the exact
                # pairing the r4 bisection showed faults the TPU worker.
                # blocked_fixed keeps blocked speed with fori-class
                # control flow at any P (ADVICE r4).
                nms_impl=("blocked_fixed" if post_nms_top_n > 512
                          else "auto"))
        )(prob, rpn_box.astype(jnp.float32), cal)
        P = post_nms_top_n
        fi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
        fbv = rois["rois_bv"].reshape(B * P, 5).at[:, 0:1].set(fi)
        fim = rois["rois_img"].reshape(B * P, 5).at[:, 0:1].set(fi)
        rt = 12 if P % 12 == 0 else 1
        pooled_bv = roi_pool_fast(c5, fbv, spatial_scale=1.0 / 8,
                                  chunk=512, rois_per_step=rt)
        pooled_img = roi_pool_fast(c5_2, fim, spatial_scale=1.0 / 8,
                                   max_in_h=max_img_h, max_in_w=max_img_w,
                                   chunk=512, rois_per_step=rt)
        return pooled_bv, pooled_img, rois["valid"].reshape(B * P)

    pooled_bv, pooled_img, valid = jax.device_get(
        run(params, jnp.asarray(bev_frames), jnp.asarray(image_frames),
            jnp.asarray(calib)))
    keep = np.asarray(valid) > 0
    if not keep.any():  # random-init calibration can yield no proposals
        keep = np.ones_like(keep)
    return (jnp.asarray(np.asarray(pooled_bv)[keep]),
            jnp.asarray(np.asarray(pooled_img)[keep]))


def build_quant_state(params, bev_frames, image_frames, pooled_bv=None,
                      pooled_img=None, use_stem=True):
    """One-call PTQ: calibrate both trunks (+ optionally the head) and
    return the quantized-state pytree consumed by eval.build_detect_*.

    bev_frames (B,601,601,9); image_frames (B,H,W,3) ALREADY
    mean-subtracted. pooled_* optionally provide head-calibration ROI
    features (int8 head skipped when absent).
    """
    bev_scales = calibrate_trunk(params, bev_frames, suffix="")
    img_scales = calibrate_trunk(params, image_frames, suffix="_2")
    state = {
        "trunk_bv": quantize_trunk(params, bev_scales, suffix=""),
        "trunk_img": quantize_trunk(params, img_scales, suffix="_2"),
        "use_stem": use_stem,
        "head": None,
    }
    if pooled_bv is not None and pooled_img is not None:
        head_scales = calibrate_head(params, pooled_bv, pooled_img)
        state["head"] = quantize_head(params, head_scales)
    return state


def trunk_apply_int8_from_stem_q(qtrunk, stem_q, conv_impl="xla"):
    """Continue the int8 trunk from an ALREADY-QUANTIZED stem output
    (int8 at conv1_2's output scale — the s2d int8 stem emits this
    directly, no bf16 round-trip)."""
    return _trunk_tail_int8(qtrunk, stem_q, conv_impl)


def _s2d_stem_int8(params, qtrunk, x, suffix="", conv_impl="pallas"):
    """Space-to-depth stem with the packed conv1_2 in int8.

    Packed conv1_1 (tiny contraction, quantizes badly) runs bf16 XLA;
    its output Y1 is quantized at the literal conv1_1 scale (the packed
    tensor holds the same values, plus zeros where the shifted layout
    maps outside y1 — ops/stem_s2d.py); packed conv1_2 runs as the
    fused s8 2x2 VALID Pallas kernel with the requant epilogue at the
    literal conv1_2 output scale; pool1 = the 4-group max directly on
    int8 (max commutes with the monotone quantization map). Returns
    (stem_q int8, s_out) feeding trunk_apply_int8_from_stem_q.
    """
    from mv3d_tf_tpu.ops.conv_s8_pallas import conv2x2_s8_pallas
    from mv3d_tf_tpu.ops.stem_s2d import _mask_edges, pack_stem_weights
    p1 = params["conv1_1" + suffix]
    p2 = params["conv1_2" + suffix]
    K1, B1, K2, B2 = pack_stem_weights(p1["weights"], p1["biases"],
                                       p2["weights"], p2["biases"])
    B, H, W, _ = x.shape
    C1 = p1["weights"].shape[3]
    Ho, Wo = H // 2, W // 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), K1.astype(jnp.bfloat16),
        window_strides=(2, 2),
        padding=((2, 2 * Ho + 2 - H), (2, 2 * Wo + 2 - W)),
        dimension_numbers=_DIMS)
    y = jax.nn.relu(y + B1.astype(jnp.bfloat16))
    y = _mask_edges(y, H, W, C1)

    s1 = qtrunk["conv1_1"]["s_out"]
    s2 = qtrunk["conv1_2"]["s_out"]
    y_q = jnp.clip(jnp.round(y.astype(jnp.float32) / s1),
                   0, 127).astype(jnp.int8)
    # in-graph weight quantization (params are traced under jit; XLA
    # constant-folds this against the baked weights)
    K2f = K2.astype(jnp.float32)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(K2f).reshape(-1, K2f.shape[-1]), axis=0) / 127.0,
        1e-12)
    K2q = jnp.clip(jnp.round(K2f / s_w), -127, 127).astype(jnp.int8)
    kk = (s1 * s_w / s2).astype(jnp.float32)
    bb = (jnp.tile(p2["biases"], 4) / s2).astype(jnp.float32)
    if (conv_impl in ("pallas", "hybrid")
            and jax.default_backend() in ("tpu", "axon")):
        # hybrid also takes the fused 2x2 kernel: the packed conv1_2
        # runs at 300x300x256, squarely in the big-map boundary class
        C2p, K2p = K2.shape[2], K2.shape[3]
        z_q = conv2x2_s8_pallas(y_q, K2q, kk, bb,
                                tile_rows=_s8_tile_rows(Ho, W=Wo,
                                                        C=C2p, K=K2p))
    elif jax.default_backend() == "cpu":
        # CPU: 2x2 VALID s8 conv as one im2col dot (XLA:CPU's s8 conv
        # lowering is ~400x slower; bit-identical — see _conv_requant)
        Bq, Hq, Wq, Cq = y_q.shape
        cols = jnp.concatenate(
            [y_q[:, dy:Hq - 1 + dy, dx:Wq - 1 + dx, :]
             for dy in range(2) for dx in range(2)], axis=-1)
        y32 = jax.lax.dot_general(
            cols.reshape(-1, 4 * Cq),
            K2q.reshape(4 * Cq, K2q.shape[-1]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(
                Bq, Hq - 1, Wq - 1, -1)
        z_q = jnp.clip(jnp.round(y32.astype(jnp.float32) * kk + bb),
                       0, 127).astype(jnp.int8)
    else:
        y32 = jax.lax.conv_general_dilated(
            y_q, K2q, (1, 1), "VALID",
            dimension_numbers=_DIMS, preferred_element_type=jnp.int32)
        z_q = jnp.clip(jnp.round(y32.astype(jnp.float32) * kk + bb),
                       0, 127).astype(jnp.int8)
    C2 = p2["weights"].shape[3]
    # 4-group phase max as an elementwise max of channel-block slices,
    # NOT reshape+reduce_max: the b32 trace showed XLA assigning
    # reduce_max a {2,3,1,0} layout against the convs' {3,0,2,1},
    # bracketing the stem output with ~12.8 ms/b32 of pure layout
    # copies (copy.312/.313/.362/.363, trace_knee_b32.log). Slices on
    # the minor dim + jnp.maximum are layout-agnostic and fuse;
    # bit-identical (same 4 ints per output).
    stem_q = z_q[..., 0 * C2:1 * C2]
    for g in range(1, 4):
        stem_q = jnp.maximum(stem_q, z_q[..., g * C2:(g + 1) * C2])
    return stem_q, s2


def rpn_head_int8(params, feat_q, s_in, conv_impl="xla"):
    """RPN head consuming the s8 trunk features directly: the 3x3
    512->512 conv runs s8 on the MXU (weights quantized in-graph,
    per-output-channel) with a fused dequant+ReLU epilogue; the tiny
    1x1 score/delta heads stay bf16 (accuracy-critical, no MXU win at
    8/24 output channels). Twin of mv3d.rpn_head."""
    from mv3d_tf_tpu.models import mv3d, vgg
    p = params["rpn_conv/3x3"]
    w = p["weights"].astype(jnp.float32)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(w).reshape(-1, w.shape[-1]), axis=0) / 127.0,
        1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    kk = (s_in * s_w).astype(jnp.float32)
    bb = p["biases"].astype(jnp.float32)
    cin, cout = w.shape[2], w.shape[3]
    if (conv_impl == "pallas" and cin % 128 == 0 and cout % 128 == 0
            and jax.default_backend() in ("tpu", "axon")):
        from mv3d_tf_tpu.ops.conv_s8_pallas import conv3x3_s8_pallas_v2
        x = conv3x3_s8_pallas_v2(feat_q, w_q, kk, bb,
                                 tile_rows=_s8_tile_rows(
                                     feat_q.shape[1], W=feat_q.shape[2],
                                     C=cin, K=cout),
                                 out_dtype=jnp.float32)
    else:
        # route every conv_impl to its own formulation so an
        # im2col/dots A/B measures a pure implementation (the rpn conv
        # is a 3x3 SAME stride-1 conv, legal for all three)
        if conv_impl == "dots":
            y32 = _conv_s8_dots(feat_q, w_q)
        elif (conv_impl == "im2col"
              or jax.default_backend() == "cpu"):
            # CPU: XLA's s8 conv lowering is ~400x slower than im2col
            # (bit-identical; see _conv_requant)
            y32 = _conv_s8_im2col(feat_q, w_q)
        else:
            y32 = _conv_s8(feat_q, w_q)
        x = jnp.maximum(y32.astype(jnp.float32) * kk + bb, 0.0)
    x = x.astype(jnp.bfloat16)
    cls = vgg.conv2d(x, params["rpn_cls_score"]["weights"],
                     params["rpn_cls_score"]["biases"],
                     padding="VALID", relu=False, dtype=jnp.bfloat16)
    bbox = vgg.conv2d(x, params["rpn_bbox_pred"]["weights"],
                      params["rpn_bbox_pred"]["biases"],
                      padding="VALID", relu=False, dtype=jnp.bfloat16)
    return cls, bbox


def _bf16_stem(params, x, suffix=""):
    """conv1_1 + conv1_2 + pool in bf16 XLA (the conv1 pair quantizes
    badly: 9/3 input channels pad to the int8 MXU tile and lose the
    speedup, measured slower than bf16)."""
    h = x.astype(jnp.bfloat16)
    for name in ("conv1_1", "conv1_2"):
        p = params[name + suffix]
        h = vgg.conv2d(h, p["weights"], p["biases"], dtype=jnp.bfloat16)
    return vgg.max_pool_2x2_valid(h)


def extract_features_int8(params, quant, bev, image, fused_stem=False,
                          stem="bf16", conv_impl="xla"):
    """Quantized twin of mv3d.extract_features.

    stem selects how conv1_1/conv1_2/pool1 run before the int8
    conv2_1..conv5_3 chain:
      "bf16"   — XLA bf16 stem (default; conv1 can't fill the int8 MXU);
      "s2d"    — space-to-depth packed bf16 stem (MXU-full 256-lane
                 convs, ops/stem_s2d.py);
      "s2d_fused" — the s2d stem as ONE Pallas VMEM kernel (single HBM
                 pass, ops/stem_s2d_pallas.py), bf16 output to the int8
                 chain;
      "s2d_int8" — s2d stem with the packed conv1_2 as the fused s8
                 2x2 Pallas kernel, feeding the trunk int8 directly;
      "int8"   — fully quantized from the input;
      "pallas" — the fused Pallas stem (DISABLED shipping-wide r2:
                 Mosaic lowering regression, see eval._fused_stem).
    fused_stem=True is the legacy alias for "pallas".

    Returns (feat_bv_q, s_bv, feat_img_q, s_img).
    """
    if fused_stem:
        stem = "pallas"
    if stem == "s2d_int8":
        stem_bv_q, s_bv_in = _s2d_stem_int8(params, quant["trunk_bv"],
                                            bev, suffix="",
                                            conv_impl=conv_impl)
        stem_img_q, s_img_in = _s2d_stem_int8(params, quant["trunk_img"],
                                              image, suffix="_2",
                                              conv_impl=conv_impl)
        feat_bv, s_bv = trunk_apply_int8_from_stem_q(
            quant["trunk_bv"], stem_bv_q, conv_impl=conv_impl)
        feat_img, s_img = trunk_apply_int8_from_stem_q(
            quant["trunk_img"], stem_img_q, conv_impl=conv_impl)
        return feat_bv, s_bv, feat_img, s_img
    if stem in ("s2d", "s2d_fused"):
        if stem == "s2d_fused":
            from mv3d_tf_tpu.ops.stem_s2d_pallas import (
                stem_s2d_fused as stem_fn)
        else:
            from mv3d_tf_tpu.ops.stem_s2d import stem_s2d as stem_fn
        p1, p2 = params["conv1_1"], params["conv1_2"]
        stem_bv = stem_fn(bev, p1["weights"], p1["biases"],
                          p2["weights"], p2["biases"],
                          dtype=jnp.bfloat16)
        p1, p2 = params["conv1_1_2"], params["conv1_2_2"]
        stem_img = stem_fn(image, p1["weights"], p1["biases"],
                           p2["weights"], p2["biases"],
                           dtype=jnp.bfloat16)
        feat_bv, s_bv = trunk_apply_int8_from_stem(
            quant["trunk_bv"], stem_bv, conv_impl=conv_impl)
        feat_img, s_img = trunk_apply_int8_from_stem(
            quant["trunk_img"], stem_img, conv_impl=conv_impl)
        return feat_bv, s_bv, feat_img, s_img
    if stem == "int8":
        feat_bv, s_bv = trunk_apply_int8(quant["trunk_bv"], bev)
        feat_img, s_img = trunk_apply_int8(quant["trunk_img"], image)
        return feat_bv, s_bv, feat_img, s_img
    if stem == "pallas":
        from mv3d_tf_tpu.ops.vgg_stem_pallas import (stem_tile_rows,
                                                     vgg_stem_pallas)
        p1, p2 = params["conv1_1"], params["conv1_2"]
        stem_bv = vgg_stem_pallas(bev, p1["weights"], p1["biases"],
                                  p2["weights"], p2["biases"],
                                  tile_rows=stem_tile_rows(
                                      bev.shape[1] // 2))
        p1, p2 = params["conv1_1_2"], params["conv1_2_2"]
        stem_img = vgg_stem_pallas(image, p1["weights"], p1["biases"],
                                   p2["weights"], p2["biases"],
                                   tile_rows=stem_tile_rows(
                                       image.shape[1] // 2))
    else:
        stem_bv = _bf16_stem(params, bev, suffix="")
        stem_img = _bf16_stem(params, image, suffix="_2")
    feat_bv, s_bv = trunk_apply_int8_from_stem(quant["trunk_bv"], stem_bv,
                                               conv_impl=conv_impl)
    feat_img, s_img = trunk_apply_int8_from_stem(quant["trunk_img"],
                                                 stem_img,
                                                 conv_impl=conv_impl)
    return feat_bv, s_bv, feat_img, s_img


# ---------------------------------------------------------------------------
# Quant-state persistence: calibrate once, serve many (the state is a
# plain pytree of int8 weights + f32 scales; .npz round-trip keeps the
# serving path free of orbax/framework dependencies)
# ---------------------------------------------------------------------------

def save_quant_state(path, state):
    """Serialize a build_quant_state pytree to one .npz file."""
    flat = {}

    def rec(prefix, node):
        if node is None:
            flat[prefix + "//none"] = np.zeros(0, np.int8)
        elif isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + "/" + k, v)
        else:
            flat[prefix] = np.asarray(node)
    rec("q", state)
    np.savez_compressed(path, **flat)


def load_quant_state(path):
    """Inverse of save_quant_state; returns the pytree with jnp leaves."""
    blob = np.load(path)
    state = {}
    for key in blob.files:
        is_none = key.endswith("//none")
        parts = [p for p in key[2:].split("/") if p]  # strip "q/"
        if is_none:
            parts = parts[:-1]                        # drop "none"
        node = state
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if is_none else jnp.asarray(blob[key])
    return state
