"""Legacy 2D KITTI imdb — the reference's lib/datasets/kitti.py (725 LoC)
capability surface for the classic 2D Faster R-CNN path (tools/demo.py /
VGGnet_train lineage), distinct from the MV3D kitti_mv3d imdb.

Rebuilt behaviors (file:line cites into /root/reference/lib/datasets/kitti.py):
  * classes ('__background__','Car','Pedestrian','Cyclist') (:25) with the
    Van -> Car remap on load (:151);
  * the load-time difficulty filter truncation < 0.5, occlusion < 3,
    2D height > 25 px (:157);
  * gt_roidb with pkl cache (:108-137) — same stale-cache guard as the
    MV3D imdb;
  * KITTI-format result writers: per-image txt (:624-665, the
    cfg.TEST.SUBCLS == False branch: alpha -10, score last) and the
    one-file variant (:668-690);
  * a WORKING per-class 2D AP evaluation on top of the writers (the
    reference only writes files) using the official difficulty protocol
    (kitti_eval.evaluate_ap_difficulty) at KITTI's class thresholds
    (car 0.7, pedestrian/cyclist 0.5).

Explicitly waived (dead external dependencies in the reference):
  * the voxel-exemplar subclass machinery (:36-56, :274-433) — requires a
    $SUBCLS_NAME/mapping.txt shipped outside the repo;
  * region_proposal_roidb for selective-search/ACF/voxel-pattern models
    (:434-623) — loads precomputed proposal files that do not exist here.
"""

import os.path as osp
import pickle

import numpy as np

from mv3d_tf_tpu.config import cfg
from mv3d_tf_tpu.data.imdb_base import Imdb

# KITTI per-class match thresholds (official evaluate_object)
CLASS_IOU = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}


class Kitti2D(Imdb):
    """2D-only KITTI object imdb (camera boxes, 3 foreground classes)."""

    def __init__(self, image_set, kitti_path=None):
        super().__init__("kitti2d_" + image_set)
        self._image_set = image_set
        self._kitti_path = (kitti_path if kitti_path is not None
                            else osp.join(cfg.DATA_DIR, "KITTI"))
        self._data_path = osp.join(self._kitti_path, "object")
        self._classes = ("__background__", "Car", "Pedestrian", "Cyclist")
        self._class_to_ind = {c: i for i, c in enumerate(self._classes)}
        self._image_index = self._load_image_set_index()
        self._roidb_handler = self.gt_roidb
        assert osp.exists(self._kitti_path), \
            "KITTI path does not exist: " + self._kitti_path

    def _prefix(self):
        return "testing" if self._image_set == "test" else "training"

    def image_path_at(self, i):
        return osp.join(self._data_path, self._prefix(), "image_2",
                        self._image_index[i] + ".png")

    def _load_image_set_index(self):
        f = osp.join(self._kitti_path, "ImageSets", self._image_set + ".txt")
        assert osp.exists(f), "Path does not exist: " + f
        with open(f) as fh:
            return [x.strip() for x in fh.readlines() if x.strip()]

    # -- annotations (kitti.py:108-190) --------------------------------------
    def _cache_key(self):
        import hashlib
        h = hashlib.sha1()
        h.update(osp.abspath(self._kitti_path).encode())
        h.update("\n".join(self._image_index).encode())
        return "{}_{}_gt_roidb.pkl".format(self.name, h.hexdigest()[:10])

    def gt_roidb(self):
        cache_file = osp.join(self.cache_path, self._cache_key())
        if osp.exists(cache_file):
            with open(cache_file, "rb") as fid:
                roidb = pickle.load(fid)
            if len(roidb) == len(self._image_index):
                print("{} gt roidb loaded from {}".format(self.name,
                                                          cache_file))
                return roidb
        roidb = [self._load_annotation(idx) for idx in self._image_index]
        with open(cache_file, "wb") as fid:
            pickle.dump(roidb, fid, pickle.HIGHEST_PROTOCOL)
        return roidb

    def _load_annotation(self, index):
        lines = []
        if self._image_set != "test":
            path = osp.join(self._data_path, "training", "label_2",
                            index + ".txt")
            with open(path) as f:
                for line in f:
                    line = line.replace("Van", "Car")   # kitti.py:151
                    words = line.split()
                    if not words:
                        continue
                    cls = words[0]
                    truncation = float(words[1])
                    occlusion = int(float(words[2]))
                    height = float(words[7]) - float(words[5])
                    # load-time difficulty filter (kitti.py:157)
                    if (cls in self._class_to_ind and truncation < 0.5
                            and occlusion < 3 and height > 25):
                        lines.append(words)

        n = len(lines)
        boxes = np.zeros((n, 4), np.float32)
        gt_classes = np.zeros(n, np.int32)
        overlaps = np.zeros((n, self.num_classes), np.float32)
        trunc = np.zeros(n, np.float32)
        occ = np.zeros(n, np.float32)
        for ix, words in enumerate(lines):
            cls = self._class_to_ind[words[0]]
            boxes[ix] = [float(v) for v in words[4:8]]
            gt_classes[ix] = cls
            overlaps[ix, cls] = 1.0
            trunc[ix] = float(words[1])
            occ[ix] = float(words[2])
        return {"boxes": boxes, "gt_classes": gt_classes,
                "gt_overlaps": overlaps, "truncation": trunc,
                "occlusion": occ, "flipped": False}

    # -- result writing (kitti.py:624-690) ------------------------------------
    def write_kitti_results(self, all_boxes, output_dir):
        """Per-image KITTI txt files (kitti.py:624-665, no-subclass
        branch: alpha -10, all 3D fields -1, score last)."""
        import os
        os.makedirs(output_dir, exist_ok=True)
        for im_ind, index in enumerate(self._image_index):
            with open(osp.join(output_dir, index + ".txt"), "wt") as f:
                for cls_ind, cls in enumerate(self._classes):
                    if cls == "__background__":
                        continue
                    dets = np.asarray(all_boxes[cls_ind][im_ind],
                                      np.float32).reshape(-1, 5)
                    for k in range(len(dets)):
                        f.write("{:s} -1 -1 {:f} {:f} {:f} {:f} {:f} -1 -1 "
                                "-1 -1 -1 -1 -1 {:.32f}\n".format(
                                    cls, -10.0, dets[k, 0], dets[k, 1],
                                    dets[k, 2], dets[k, 3], dets[k, 4]))
        return output_dir

    def write_kitti_results_one_file(self, all_boxes, output_dir):
        """Single detections.txt (kitti.py:668-690, subcls = -1)."""
        import os
        os.makedirs(output_dir, exist_ok=True)
        path = osp.join(output_dir, "detections.txt")
        with open(path, "wt") as f:
            for im_ind, index in enumerate(self._image_index):
                for cls_ind, cls in enumerate(self._classes):
                    if cls == "__background__":
                        continue
                    dets = np.asarray(all_boxes[cls_ind][im_ind],
                                      np.float32).reshape(-1, 5)
                    for k in range(len(dets)):
                        f.write("{:s} {:s} {:f} {:f} {:f} {:f} {:d} "
                                "{:f}\n".format(index, cls, dets[k, 0],
                                                dets[k, 1], dets[k, 2],
                                                dets[k, 3], -1, dets[k, 4]))
        return path

    def evaluate_detections(self, all_boxes, output_dir):
        """Write KITTI files AND compute per-class official-protocol 2D AP
        (the reference's eval stops at file writing)."""
        from mv3d_tf_tpu.data.kitti_eval import (evaluate_ap_difficulty,
                                                 gt_levels, iou_2d)
        self.write_kitti_results(all_boxes, output_dir)
        self.write_kitti_results_one_file(all_boxes, output_dir)
        if self._image_set == "test":
            return {}
        table = {}
        for cls_ind, cls in enumerate(self._classes):
            if cls == "__background__":
                continue
            frames = []
            for i in range(self.num_images):
                e = self.roidb[i]
                m = e["gt_classes"] == cls_ind
                g = e["boxes"][m]
                dets = np.asarray(all_boxes[cls_ind][i],
                                  np.float32).reshape(-1, 5)
                frames.append({
                    "dets": dets[:, :4], "scores": dets[:, 4],
                    "det_heights": dets[:, 3] - dets[:, 1] + 1,
                    "gts": g,
                    "levels": gt_levels(g, e["truncation"][m],
                                        e["occlusion"][m]),
                    "iou": iou_2d})
            table[cls] = {
                d: evaluate_ap_difficulty(frames, CLASS_IOU[cls], d)["ap"]
                for d in ("easy", "moderate", "hard")}
            print("2D AP {:>10s}: easy {:.4f} moderate {:.4f} "
                  "hard {:.4f}".format(cls, table[cls]["easy"],
                                       table[cls]["moderate"],
                                       table[cls]["hard"]))
        return table
