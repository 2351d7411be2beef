"""Visualization (lib/utils/draw.py capability surface) with PIL instead
of matplotlib/cv2/mayavi — headless-safe, writes PNGs."""

import numpy as np


def scale_to_255(a, min=0.0, max=2.0, dtype=np.uint8):
    """Linear rescale to [0,255] (draw.py / read_lidar helper parity)."""
    return (((np.clip(a, min, max) - min) / float(max - min))
            * 255).astype(dtype)


def _as_pil(image):
    from PIL import Image
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def show_image_boxes(image, boxes, color=(0, 255, 0), width=1):
    """Draw (N,4) [x1,y1,x2,y2] rectangles; returns a numpy image."""
    from PIL import ImageDraw
    im = _as_pil(image)
    dr = ImageDraw.Draw(im)
    for b in np.asarray(boxes).reshape(-1, 4):
        x1, y1, x2, y2 = [float(v) for v in b]
        dr.rectangle([min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)],
                     outline=color, width=width)
    return np.asarray(im)


# the 12 edges of the (x0..x7,y0..y7,z0..z7) corner layout
BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
             (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]


def show_lidar_corners(image, corners, calib, color=(255, 64, 64), width=1):
    """Project (N,24) lidar corners through the calib blob and draw the
    wireframe boxes on the image."""
    from PIL import ImageDraw

    from mv3d_tf_tpu import geometry as G
    im = _as_pil(image)
    dr = ImageDraw.Draw(im)
    corners = np.asarray(corners).reshape(-1, 24)
    calib = np.asarray(calib)
    Tr = calib[3].reshape(3, 4)
    R0 = calib[2].reshape(4, 3)
    P2 = calib[0].reshape(3, 4)
    mat = P2 @ R0 @ Tr
    for cnr in corners:
        c = np.vstack([cnr.reshape(3, 8), np.zeros(8)])
        img = mat @ c
        img = img / np.where(np.abs(img[2]) > 1e-6, img[2], 1e-6)
        for a, b in BOX_EDGES:
            dr.line([float(img[0, a]), float(img[1, a]),
                     float(img[0, b]), float(img[1, b])],
                    fill=color, width=width)
    del G
    return np.asarray(im)


def show_bev_detections(bev, boxes_bv, scores=None, channel=8):
    """BEV intensity channel + detection rectangles -> numpy image."""
    base = scale_to_255(np.asarray(bev)[:, :, channel], 0, 1)
    return show_image_boxes(base, boxes_bv)
