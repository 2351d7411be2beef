"""MV3D detector: dual VGG16 trunks + BEV RPN + multi-view fusion head.

One parameter pytree and pure apply functions replace the reference's two
separate TF graphs (MV3D_train.py / MV3D_test.py) — train vs test is a
flag (dropout keys / target layers), not a different model.

Layer names and shapes match the reference exactly so pretrained .npy
checkpoints load 1:1:
  rpn_conv/3x3 (512), rpn_cls_score (A*2=8), rpn_bbox_pred (A*6=24)
  (MV3D_train.py:82-94), fc6_1/fc7_1/fc6_2/fc7_2 (2048),
  cls_score (2), bbox_pred (48, stddev 0.001 init) (MV3D_train.py:158-182).

FC layers flatten 4D inputs channel-major (transpose NHWC->NCHW then
reshape, network.py:376-381) to keep weight-matrix row order identical to
the reference — required for checkpoint parity.
"""

import jax
import jax.numpy as jnp

from mv3d_tf_tpu.models import vgg

N_CLASSES = 2            # background, Car (MV3D_train.py:4)
NUM_ANCHORS = 4          # generate_anchors_bv -> 4 anchors/location
FEAT_STRIDE = 8          # three VALID pools (MV3D_train.py:5)


def _fc_init(key, shape, stddev=0.01):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                       jnp.float32) * stddev


def init_params(key, bev_channels=9, fc_dim=2048, pooled=7):
    """Full MV3D parameter pytree with reference naming."""
    keys = jax.random.split(key, 16)
    params = {}
    params.update(vgg.init_trunk(keys[0], bev_channels, suffix=""))
    params.update(vgg.init_trunk(keys[1], 3, suffix="_2"))

    def conv_p(k, cin, cout, stddev=0.01):
        return {"weights": _fc_init(k, (3, 3, cin, cout), stddev),
                "biases": jnp.zeros((cout,), jnp.float32)}

    def conv1x1_p(k, cin, cout):
        return {"weights": _fc_init(k, (1, 1, cin, cout), 0.01),
                "biases": jnp.zeros((cout,), jnp.float32)}

    def fc_p(k, cin, cout, stddev=0.01):
        return {"weights": _fc_init(k, (cin, cout), stddev),
                "biases": jnp.zeros((cout,), jnp.float32)}

    params["rpn_conv/3x3"] = conv_p(keys[2], 512, 512)
    params["rpn_cls_score"] = conv1x1_p(keys[3], 512, NUM_ANCHORS * 2)
    params["rpn_bbox_pred"] = conv1x1_p(keys[4], 512, NUM_ANCHORS * 6)

    roi_dim = 512 * pooled * pooled
    params["fc6_1"] = fc_p(keys[5], roi_dim, fc_dim)
    params["fc7_1"] = fc_p(keys[6], fc_dim, fc_dim)
    params["fc6_2"] = fc_p(keys[7], roi_dim, fc_dim)
    params["fc7_2"] = fc_p(keys[8], fc_dim, fc_dim)
    params["cls_score"] = fc_p(keys[9], 2 * fc_dim, N_CLASSES)
    # bbox_pred uses stddev 0.001 (network.py:385-387)
    params["bbox_pred"] = fc_p(keys[10], 2 * fc_dim, N_CLASSES * 24,
                               stddev=0.001)
    return params


def fc_apply(p, x, relu=True):
    """FC over 4D inputs flattened NHWC (network.py:369-397 equivalence).

    The reference flattens channel-major (transpose NCHW then reshape,
    network.py:376-381); that transpose is expensive on TPU, so here the
    input flattens NHWC directly and the WEIGHT ROWS of imported fc6
    checkpoints are permuted once at load time instead
    (utils/weights.py) — end-to-end behavior is identical.
    """
    if x.ndim == 4:
        n = x.shape[0]
        x = x.reshape(n, -1)
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    y = (jnp.matmul(x, p["weights"].astype(x.dtype), precision=precision)
         + p["biases"].astype(x.dtype))
    return jax.nn.relu(y) if relu else y


def dropout(key, x, keep_prob):
    """TF-style dropout: scale by 1/keep_prob at train (network.py:407-409)."""
    if key is None or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def extract_features(params, bev, image, dtype=None, fused_stem=False,
                     stem_impl=None):
    """Both trunks: (B,601,601,9) & (B,H,W,3) -> stride-8 conv5_3 maps."""
    conv5_3 = vgg.trunk_apply(params, bev, suffix="", dtype=dtype,
                              fused_stem=fused_stem, stem_impl=stem_impl)
    conv5_3_2 = vgg.trunk_apply(params, image, suffix="_2", dtype=dtype,
                                fused_stem=fused_stem, stem_impl=stem_impl)
    return conv5_3, conv5_3_2


def rpn_head(params, conv5_3, dtype=None):
    """RPN conv + score/delta heads on the BEV features.

    Returns rpn_cls_score (B,h,w,2A), rpn_bbox_pred (B,h,w,6A).
    MV3D_train.py:82-94.
    """
    x = vgg.conv2d(conv5_3, params["rpn_conv/3x3"]["weights"],
                   params["rpn_conv/3x3"]["biases"], dtype=dtype)
    cls = vgg.conv2d(x, params["rpn_cls_score"]["weights"],
                     params["rpn_cls_score"]["biases"],
                     padding="VALID", relu=False, dtype=dtype)
    bbox = vgg.conv2d(x, params["rpn_bbox_pred"]["weights"],
                      params["rpn_bbox_pred"]["biases"],
                      padding="VALID", relu=False, dtype=dtype)
    return cls, bbox


def rpn_probs(rpn_cls_score):
    """Per-anchor softmax: reshape (B,h,w,2A)->(...,2), softmax, back.

    Equivalent to the reference's reshape_layer(2) + softmax + reshape
    chain (MV3D_train.py:98-103, network.py:333-341,399-405).
    """
    b, h, w, c = rpn_cls_score.shape
    pairs = rpn_cls_score.reshape(b, h, w, c // 2, 2)
    probs = jax.nn.softmax(pairs.astype(jnp.float32), axis=-1)
    return probs.reshape(b, h, w, c)


def rpn_fg_scores(rpn_cls_prob_reshape):
    """Foreground scores in anchor order (location-major, anchor-minor).

    proposal_layer_tf.py:63: reshape [1,H,W,A,2][...,:,1] -> (H*W*A,).
    """
    b, h, w, c = rpn_cls_prob_reshape.shape
    return rpn_cls_prob_reshape.reshape(b, h, w, c // 2, 2)[..., 1].reshape(b, -1)


def fusion_head(params, pooled_bv, pooled_img, keep_prob=1.0, rng=None,
                train=False, dtype=None):
    """ROI-pooled features from both views -> class scores + corner deltas.

    Train graph (MV3D_train.py:158-182): fc6->drop->fc7->drop per view,
    concat, drop, cls_score / bbox_pred (both heads read the SAME dropped
    concat — the train graph's 'drop7' name collision means bbox_pred
    feeds from the concat dropout output too).
    Test graph (MV3D_test.py:103-123): no dropout, same fc stack.
    """
    if train and rng is not None:
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    else:
        k1 = k2 = k3 = k4 = k5 = None

    if dtype is not None:
        pooled_bv = pooled_bv.astype(dtype)
        pooled_img = pooled_img.astype(dtype)

    f1 = fc_apply(params["fc6_1"], pooled_bv)
    f1 = dropout(k1, f1, keep_prob)
    f1 = fc_apply(params["fc7_1"], f1)
    f1 = dropout(k2, f1, keep_prob)

    f2 = fc_apply(params["fc6_2"], pooled_img)
    f2 = dropout(k3, f2, keep_prob)
    f2 = fc_apply(params["fc7_2"], f2)
    f2 = dropout(k4, f2, keep_prob)

    fused = jnp.concatenate([f1, f2], axis=1)
    fused = dropout(k5, fused, keep_prob)
    cls_score = fc_apply(params["cls_score"], fused, relu=False)
    cls_prob = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    bbox_pred = fc_apply(params["bbox_pred"], fused, relu=False)
    return cls_score, cls_prob, bbox_pred
