"""Image blob helpers — lib/utils/blob.py capability surface
(prep_im_for_blob, im_list_to_blob) for the legacy 2D path, and the
make_bird_view wrapper routed to the on-device BEV rasterizer."""

import numpy as np


def prep_im_for_blob(im, pixel_means, target_size, max_size):
    """Mean-subtract + scale so the short side hits target_size without the
    long side exceeding max_size (blob.py semantics). Returns (im, scale)."""
    from PIL import Image
    im = im.astype(np.float32, copy=False) - pixel_means
    h, w = im.shape[:2]
    im_size_min = min(h, w)
    im_size_max = max(h, w)
    im_scale = float(target_size) / float(im_size_min)
    if round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    new_w = int(round(w * im_scale))
    new_h = int(round(h * im_scale))
    # bilinear resize channel-wise via PIL (cv2-free)
    chans = [np.asarray(Image.fromarray(im[:, :, c]).resize(
        (new_w, new_h), Image.BILINEAR)) for c in range(im.shape[2])]
    return np.stack(chans, axis=2), im_scale


def im_list_to_blob(ims):
    """Pad a list of images into one (N, Hmax, Wmax, 3) blob (blob.py)."""
    max_shape = np.array([im.shape for im in ims]).max(axis=0)
    blob = np.zeros((len(ims), max_shape[0], max_shape[1], 3), np.float32)
    for i, im in enumerate(ims):
        blob[i, :im.shape[0], :im.shape[1], :] = im
    return blob


def make_bird_view(velodyne_path):
    """Velodyne .bin -> BEV raster (lib/utils/blob.py:46-55 wrapper),
    routed through the on-device rasterizer."""
    import numpy as _np

    from mv3d_tf_tpu.ops import bev as bev_ops
    scan = bev_ops.load_velodyne(velodyne_path)
    pts, valid = bev_ops.pad_points(scan)
    return _np.asarray(bev_ops.point_cloud_2_top(pts, valid))
