"""Vectorized IoU matrix — replaces the reference's Cython double loop
(lib/utils/bbox.pyx:15-55) with one jnp broadcast.

Keeps the Fast R-CNN +1 pixel-area convention and the zero-on-no-overlap
behavior exactly.
"""

import jax.numpy as jnp


def bbox_overlaps(boxes, query_boxes):
    """(N,4) x (K,4) -> (N,K) IoU with the +1 convention."""
    boxes = jnp.asarray(boxes, jnp.float32)
    query = jnp.asarray(query_boxes, jnp.float32)
    b = boxes[:, None, :]                              # (N,1,4)
    q = query[None, :, :]                              # (1,K,4)
    iw = (jnp.minimum(b[..., 2], q[..., 2])
          - jnp.maximum(b[..., 0], q[..., 0]) + 1.0)
    ih = (jnp.minimum(b[..., 3], q[..., 3])
          - jnp.maximum(b[..., 1], q[..., 1]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_b = ((boxes[:, 2] - boxes[:, 0] + 1.0)
              * (boxes[:, 3] - boxes[:, 1] + 1.0))[:, None]
    area_q = ((query[:, 2] - query[:, 0] + 1.0)
              * (query[:, 3] - query[:, 1] + 1.0))[None, :]
    ua = area_b + area_q - inter
    iou = inter / ua
    # zero (not negative/NaN) when there is no overlap, like bbox.pyx:43-48
    return jnp.where((iw > 0.0) & (ih > 0.0), iou, 0.0)


def iou_one_to_many(box, boxes):
    """IoU of one (4,) box against (N,4) boxes (same convention)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    box = jnp.asarray(box, jnp.float32)
    iw = (jnp.minimum(box[2], boxes[:, 2])
          - jnp.maximum(box[0], boxes[:, 0]) + 1.0)
    ih = (jnp.minimum(box[3], boxes[:, 3])
          - jnp.maximum(box[1], boxes[:, 1]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    area_b = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    return inter / (area_a + area_b - inter)
