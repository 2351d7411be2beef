"""RPN proposal pre-generation — the live half of the reference's legacy
rpn_msr layers (lib/rpn_msr/generate.py:76-131): run the RPN over every
image of an imdb and return per-image proposal boxes (in ORIGINAL image
coordinates) + scores, the stage-1 artifact of py-faster-rcnn's
alternating-optimization recipe.

TPU shape: one jitted RPN-only program (trunk -> RPN head -> in-graph
proposal layer) at a static padding bucket, fixed post-NMS slot count
with a validity mask; the /scale unproject (generate.py:100-101) happens
on host per frame.

The caffe.Layer shells around the same math (lib/rpn_msr/
proposal_layer.py:18, anchor_target_layer.py:20) are NOT rebuilt: they
are framework adapters for Caffe, not capabilities — the math they wrap
is proposals.py / targets.py / faster_rcnn_2d.py (waiver in PROGRESS.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu.config import cfg


@functools.lru_cache(maxsize=4)
def _build_rpn_only(feat_h, feat_w, pre_nms_top_n, post_nms_top_n,
                    compute_dtype=None):
    from mv3d_tf_tpu.faster_rcnn_2d import proposal_layer_2d
    from mv3d_tf_tpu.models import vggnet
    from mv3d_tf_tpu.models.mv3d import rpn_probs

    @jax.jit
    def rpn_forward(params, image, im_info):
        c5 = vggnet.trunk_apply_2d(params, image[None], dtype=compute_dtype)
        cls, box = vggnet.rpn_head_2d(params, c5, dtype=compute_dtype)
        prob = rpn_probs(cls)
        rois, scores, valid = proposal_layer_2d(
            prob, box.astype(jnp.float32), im_info, feat_h, feat_w,
            pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=cfg.TEST.RPN_MIN_SIZE)
        return rois, scores, valid

    return rpn_forward


def im_proposals(params, im_bgr, bucket_hw=(608, 1024),
                 pre_nms_top_n=None, post_nms_top_n=None,
                 compute_dtype=None):
    """Proposals for one BGR float32 image (generate.py:76-101):
    mean-subtract, scale by TEST.SCALES_BASE[0], run the RPN, divide the
    boxes back by the scale. Returns (boxes (N,4), scores (N,1))."""
    assert len(cfg.TEST.SCALES_BASE) == 1  # generate.py:63 assert
    scale = float(cfg.TEST.SCALES_BASE[0])
    pre = pre_nms_top_n or cfg.TEST.RPN_PRE_NMS_TOP_N
    post = post_nms_top_n or cfg.TEST.RPN_POST_NMS_TOP_N

    im = im_bgr.astype(np.float32) - cfg.PIXEL_MEANS.reshape(1, 1, 3)
    if scale != 1.0:
        from PIL import Image
        h = int(round(im.shape[0] * scale))
        w = int(round(im.shape[1] * scale))
        im = np.stack([np.asarray(Image.fromarray(im[:, :, c]).resize(
            (w, h), Image.BILINEAR)) for c in range(3)], axis=2)
    h = min(im.shape[0], bucket_hw[0])
    w = min(im.shape[1], bucket_hw[1])
    padded = np.zeros((bucket_hw[0], bucket_hw[1], 3), np.float32)
    padded[:h, :w] = im[:h, :w]
    im_info = np.array([h, w, scale], np.float32)

    fwd = _build_rpn_only(bucket_hw[0] // 16, bucket_hw[1] // 16,
                          pre, post, compute_dtype)
    rois, scores, valid = fwd(params, padded, im_info)
    rois, scores, valid = (np.asarray(rois), np.asarray(scores),
                           np.asarray(valid))
    keep = valid.astype(bool)
    boxes = rois[keep, 1:5] / scale           # generate.py:100 unproject
    return boxes, scores[keep, None]


def imdb_proposals(params, imdb, log=print, **kw):
    """Proposals for every image in an imdb (generate.py:103-131);
    returns a list of (N_i, 4) arrays (imdb_boxes)."""
    from mv3d_tf_tpu.data.loader import load_image_bgr
    from mv3d_tf_tpu.utils.timer import Timer

    t = Timer()
    out = []
    for i in range(imdb.num_images):
        im = load_image_bgr(imdb.image_path_at(i))
        t.tic()
        boxes, scores = im_proposals(params, im, **kw)
        t.toc()
        out.append(boxes)
        if log:
            log("im_proposals: {:d}/{:d} {:.3f}s".format(
                i + 1, imdb.num_images, t.average_time))
    return out


def imdb_proposals_det(params, imdb, log=print, **kw):
    """Like imdb_proposals but returns (N_i, 5) [x1,y1,x2,y2,score] dets
    (generate.py:113-131 imdb_proposals_det)."""
    from mv3d_tf_tpu.data.loader import load_image_bgr

    out = []
    for i in range(imdb.num_images):
        im = load_image_bgr(imdb.image_path_at(i))
        boxes, scores = im_proposals(params, im, **kw)
        out.append(np.hstack([boxes, scores]).astype(np.float32))
        if log:
            log("im_proposals: {:d}/{:d}".format(i + 1, imdb.num_images))
    return out
