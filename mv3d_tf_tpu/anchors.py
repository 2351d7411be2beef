"""Anchor generation — static, precomputed at trace time.

The BEV anchors (lib/rpn_msr/generate_anchors.py:37-51) and their shifted
grid (proposal_layer_tf.py:79-95, anchor_target_layer_tf.py:76-89) depend
only on the (static) feature-map shape, so the whole K*A anchor table, its
3D lift, and the inside-image mask are baked into the jit program as
constants — the reference recomputes all of this on the host every step.

Anchor order is location-major / anchor-minor, matching the reference's
score reshape [1,H,W,A,2][...,1] -> (H*W*A,) and delta reshape (-1,6).
"""

import numpy as np

from mv3d_tf_tpu.geometry import CAR_HEIGHT, LIDAR_HEIGHT, RES


def generate_anchors_bv(base_size=((3.9, 1.6), (1.0, 0.6)), res=0.1):
    """BEV anchor priors: car 3.9x1.6 m + small 1.0x0.6 m, x2 orientations.

    generate_anchors.py:37-51 — NB int() truncation of meters/res uses the
    same IEEE float semantics as the reference (3.9/0.1 -> 38 via 38.99...).
    """
    base_anchors = np.vstack(
        [[0, 0, int(base[0] / res), int(base[1] / res)] for base in base_size])
    base_anchors[:, 0] -= base_anchors[:, 2] // 2
    base_anchors[:, 1] -= base_anchors[:, 3] // 2
    base_anchors[:, 2] -= base_anchors[:, 2] // 2
    base_anchors[:, 3] -= base_anchors[:, 3] // 2
    anchors = np.vstack((base_anchors, base_anchors[:, [1, 0, 3, 2]]))
    return anchors


def generate_anchors(base_size=16, ratios=(0.5, 1, 2),
                     scales=2 ** np.arange(3, 6)):
    """Classic Faster R-CNN scale/ratio anchors (legacy 2D path).
    generate_anchors.py:53-113."""
    base_anchor = np.array([1, 1, base_size, base_size]) - 1
    ratio_anchors = _ratio_enum(base_anchor, np.array(ratios, np.float64))
    return np.vstack([_scale_enum(ratio_anchors[i, :], np.array(scales))
                      for i in range(ratio_anchors.shape[0])])


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws, hs = ws[:, None], hs[:, None]
    return np.hstack((x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)))


def _ratio_enum(anchor, ratios):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size_ratios = w * h / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    return _mkanchors(w * scales, h * scales, x_ctr, y_ctr)


def shift_anchors(base_anchors, height, width, feat_stride):
    """Enumerate the (K*A, 4) shifted anchor grid, location-major.
    proposal_layer_tf.py:79-95."""
    shift_x = np.arange(0, width) * feat_stride
    shift_y = np.arange(0, height) * feat_stride
    shift_x, shift_y = np.meshgrid(shift_x, shift_y)
    shifts = np.vstack((shift_x.ravel(), shift_y.ravel(),
                        shift_x.ravel(), shift_y.ravel())).transpose()
    A = base_anchors.shape[0]
    K = shifts.shape[0]
    all_anchors = (base_anchors.reshape(1, A, 4)
                   + shifts.reshape(1, K, 4).transpose(1, 0, 2))
    return all_anchors.reshape(K * A, 4).astype(np.float32)


def bv_anchor_to_lidar_np(anchors):
    """numpy twin of geometry.bv_anchor_to_lidar for trace-time precompute.
    transform.py:89-111."""
    from mv3d_tf_tpu.geometry import Xn, Yn, TOP_X_MIN, TOP_Y_MIN
    a = anchors.astype(np.float64)
    lengths = (a[:, 3] - a[:, 1]) * RES
    widths = (a[:, 2] - a[:, 0]) * RES
    cxx = (a[:, 0] + a[:, 2]) / 2.0
    cyy = (a[:, 1] + a[:, 3]) / 2.0
    y = Xn * RES - (cxx + 0.5) * RES + TOP_Y_MIN
    x = Yn * RES - (cyy + 0.5) * RES + TOP_X_MIN
    z = np.full_like(x, -(LIDAR_HEIGHT - CAR_HEIGHT / 2.0))
    h = np.full_like(x, CAR_HEIGHT)
    return np.stack([x, y, z, lengths, widths, h], axis=1).astype(np.float32)


def inside_image_mask(all_anchors, im_height, im_width, allowed_border=0):
    """Boolean mask of anchors fully inside the image.
    anchor_target_layer_tf.py:93-98."""
    return ((all_anchors[:, 0] >= -allowed_border)
            & (all_anchors[:, 1] >= -allowed_border)
            & (all_anchors[:, 2] < im_width + allowed_border)
            & (all_anchors[:, 3] < im_height + allowed_border))


class AnchorGrid:
    """Static per-shape anchor tables shared by proposal + target layers."""

    def __init__(self, height, width, feat_stride=8,
                 im_height=601, im_width=601):
        self.height = height
        self.width = width
        self.feat_stride = feat_stride
        self.base = generate_anchors_bv()
        self.num_anchors = self.base.shape[0]              # A = 4
        self.anchors_bv = shift_anchors(self.base, height, width, feat_stride)
        self.anchors_3d = bv_anchor_to_lidar_np(self.anchors_bv)
        self.total = self.anchors_bv.shape[0]              # K*A
        self.inside = inside_image_mask(self.anchors_bv, im_height, im_width)


_GRID_CACHE = {}


def get_anchor_grid(height, width, feat_stride=8, im_height=601, im_width=601):
    key = (height, width, feat_stride, im_height, im_width)
    if key not in _GRID_CACHE:
        _GRID_CACHE[key] = AnchorGrid(height, width, feat_stride,
                                      im_height, im_width)
    return _GRID_CACHE[key]
