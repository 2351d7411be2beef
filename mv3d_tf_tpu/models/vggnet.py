"""Legacy 2D Faster R-CNN VGG16 path (lib/networks/VGGnet_train.py /
VGGnet_test.py) — the repo's original 21-class VOC detector, kept for
capability parity with the reference (tools/demo.py uses it).

Differences from the MV3D trunks: FOUR VALID pools (stride 16), conv1/
conv2 frozen during training (VGGnet_train.py:35-39), 9 anchors per
location (3 scales x 3 ratios), 4096-wide fc6/fc7, 4-dof box deltas.
"""

import jax
import jax.numpy as jnp

from mv3d_tf_tpu.models import vgg
from mv3d_tf_tpu.models.mv3d import dropout, fc_apply

N_CLASSES_2D = 21
FEAT_STRIDE_2D = 16
NUM_ANCHORS_2D = 9
# pools after conv1_2, conv2_2, conv3_3, conv4_3 (VGGnet_train.py:34-51)
VGG16_LAYERS = tuple(
    (name, c, name in ("conv1_2", "conv2_2", "conv3_3", "conv4_3"))
    for name, c, _ in vgg.VGG_LAYERS)
# conv1/conv2 are frozen in the reference (trainable=False)
FROZEN_2D = ("conv1_1", "conv1_2", "conv2_1", "conv2_2")


def init_params_2d(key, n_classes=N_CLASSES_2D, fc_dim=4096, pooled=7):
    keys = jax.random.split(key, 8)
    params = vgg.init_trunk(keys[0], 3)

    def fc_p(k, cin, cout, stddev=0.01):
        w = jax.random.truncated_normal(k, -2.0, 2.0, (cin, cout),
                                        jnp.float32) * stddev
        return {"weights": w, "biases": jnp.zeros((cout,), jnp.float32)}

    def conv_p(k, kh, cin, cout):
        w = jax.random.truncated_normal(k, -2.0, 2.0, (kh, kh, cin, cout),
                                        jnp.float32) * 0.01
        return {"weights": w, "biases": jnp.zeros((cout,), jnp.float32)}

    params["rpn_conv/3x3"] = conv_p(keys[1], 3, 512, 512)
    params["rpn_cls_score"] = conv_p(keys[2], 1, 512, NUM_ANCHORS_2D * 2)
    params["rpn_bbox_pred"] = conv_p(keys[3], 1, 512, NUM_ANCHORS_2D * 4)
    params["fc6"] = fc_p(keys[4], 512 * pooled * pooled, fc_dim)
    params["fc7"] = fc_p(keys[5], fc_dim, fc_dim)
    params["cls_score"] = fc_p(keys[6], fc_dim, n_classes)
    params["bbox_pred"] = fc_p(keys[7], fc_dim, n_classes * 4, stddev=0.001)
    return params


def trunk_apply_2d(params, x, dtype=None):
    """Stride-16 VGG16 trunk -> conv5_3 (B, H/16, W/16, 512)."""
    for name, _, pool in VGG16_LAYERS:
        p = params[name]
        x = vgg.conv2d(x, p["weights"], p["biases"], dtype=dtype)
        if pool:
            x = vgg.max_pool_2x2_valid(x)
    return x


def rpn_head_2d(params, conv5_3, dtype=None):
    x = vgg.conv2d(conv5_3, params["rpn_conv/3x3"]["weights"],
                   params["rpn_conv/3x3"]["biases"], dtype=dtype)
    cls = vgg.conv2d(x, params["rpn_cls_score"]["weights"],
                     params["rpn_cls_score"]["biases"],
                     padding="VALID", relu=False, dtype=dtype)
    bbox = vgg.conv2d(x, params["rpn_bbox_pred"]["weights"],
                      params["rpn_bbox_pred"]["biases"],
                      padding="VALID", relu=False, dtype=dtype)
    return cls, bbox


def head_2d(params, pooled, keep_prob=1.0, rng=None, train=False):
    """fc6 -> drop -> fc7 -> drop -> cls/bbox (VGGnet_train.py:81-91)."""
    if train and rng is not None:
        k1, k2 = jax.random.split(rng)
    else:
        k1 = k2 = None
    x = fc_apply(params["fc6"], pooled)
    x = dropout(k1, x, keep_prob)
    x = fc_apply(params["fc7"], x)
    x = dropout(k2, x, keep_prob)
    cls_score = fc_apply(params["cls_score"], x, relu=False)
    cls_prob = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    bbox_pred = fc_apply(params["bbox_pred"], x, relu=False)
    return cls_score, cls_prob, bbox_pred


def freeze_2d_grads(grads):
    """Zero gradients of the frozen conv1/conv2 blocks (the reference
    marks them trainable=False)."""
    out = dict(grads)
    for name in FROZEN_2D:
        if name in out:
            out[name] = jax.tree.map(jnp.zeros_like, out[name])
    return out
