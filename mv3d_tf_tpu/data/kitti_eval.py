"""KITTI-style AP evaluation — a working replacement for the reference's
ABSENT external evaluator (kitti_mv3d.py:392-395 shells out to
kitti/eval/cpp/evaluate_object, which is not in the repo, and the call is
commented out). Pure numpy, BEV-box AP at a configurable IoU threshold
with the KITTI R40 recall sampling.
"""

import numpy as np

from mv3d_tf_tpu.ops.iou import bbox_overlaps


def ap_r40(rec, prec):
    """KITTI 40-point interpolated AP."""
    ap = 0.0
    for t in np.linspace(1.0 / 40, 1.0, 40):
        p = prec[rec >= t]
        ap += (np.max(p) if p.size else 0.0) / 40.0
    return float(ap)


def evaluate_bev_ap(all_dets, gt_boxes_per_image, iou_thresh=0.7):
    """AP for one class over a dataset.

    Args:
      all_dets: list over images of (N_i, 5) [x1,y1,x2,y2,score] arrays.
      gt_boxes_per_image: list over images of (M_i, 4) gt BEV boxes.
      iou_thresh: match threshold (KITTI car: 0.7).
    Returns dict with ap (R40), recall, precision arrays.
    """
    records = []          # (score, is_tp)
    npos = 0
    for dets, gts in zip(all_dets, gt_boxes_per_image):
        gts = np.asarray(gts, np.float32).reshape(-1, 4)
        npos += len(gts)
        dets = np.asarray(dets, np.float32).reshape(-1, 5)
        if len(dets) == 0:
            continue
        order = np.argsort(-dets[:, 4])
        dets = dets[order]
        taken = np.zeros(len(gts), bool)
        if len(gts):
            ious = np.asarray(bbox_overlaps(dets[:, :4], gts))
        for d in range(len(dets)):
            tp = False
            if len(gts):
                j = int(np.argmax(np.where(taken, -1.0, ious[d])))
                if not taken[j] and ious[d, j] >= iou_thresh:
                    taken[j] = True
                    tp = True
            records.append((dets[d, 4], tp))
    if not records or npos == 0:
        return {"ap": 0.0, "recall": np.zeros(0), "precision": np.zeros(0),
                "num_gt": npos}
    records.sort(key=lambda r: -r[0])
    tps = np.cumsum([r[1] for r in records])
    fps = np.cumsum([not r[1] for r in records])
    rec = tps / float(npos)
    prec = tps / np.maximum(tps + fps, 1e-9)
    return {"ap": ap_r40(rec, prec), "recall": rec, "precision": prec,
            "num_gt": npos}


def evaluate_kitti_bev(imdb, all_boxes, iou_thresh=0.7, cls_ind=1):
    """Convenience wrapper: detections vs an imdb's gt BEV boxes."""
    gts = []
    for i in range(imdb.num_images):
        entry = imdb.roidb[i]
        mask = entry["gt_classes"] == cls_ind
        gts.append(entry["boxes_bv"][mask])
    dets = [np.asarray(all_boxes[cls_ind][i]).reshape(-1, 5)
            for i in range(imdb.num_images)]
    return evaluate_bev_ap(dets, gts, iou_thresh)
