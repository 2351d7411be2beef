"""Remaining dataset families from the reference's capability surface
(lib/datasets/kitti_tracking.py, coco.py, nissan.py, nthu.py,
pascal3d.py, imagenet3d.py) — compact, functional rebuilds.

* KittiTracking: KITTI tracking sequences (per-sequence label_02 txt with
  frame-indexed object rows) exposed frame-by-frame like kitti_mv3d.
* Coco: COCO instances JSON parsed with the stdlib json module (no
  pycocotools dependency); detection results written in COCO format.
* Nissan / NTHU: image-list drive sequences for inference/demo (the
  reference versions carry no usable gt either).
* Pascal3D / Imagenet3D: VOC-style XML detection with the 12 rigid
  categories (viewpoint metadata parsed when present).
"""

import json
import os
import os.path as osp

import numpy as np

from mv3d_tf_tpu.data.imdb_base import Imdb
from mv3d_tf_tpu.data.pascal_voc import PascalVOC

PASCAL3D_CLASSES = ("__background__",
                    "aeroplane", "bicycle", "boat", "bottle", "bus", "car",
                    "chair", "diningtable", "motorbike", "sofa", "train",
                    "tvmonitor")


class KittiTracking(Imdb):
    """kitti_tracking_<split>_<seq> (kitti_tracking.py layout):
    <root>/<split>/image_02/<seq>/<frame>.png,
    <root>/<split>/label_02/<seq>.txt, calib/<seq>.txt, velodyne/<seq>/."""

    def __init__(self, split, sequence, root):
        super().__init__("kitti_tracking_{}_{}".format(split, sequence))
        self._root = root
        self._split = "training" if split != "test" else "testing"
        self._sequence = sequence
        self._classes = ("__background__", "Car")
        self._class_to_ind = {c: i for i, c in enumerate(self._classes)}
        img_dir = osp.join(root, self._split, "image_02", sequence)
        self._image_index = sorted(
            f[:-4] for f in os.listdir(img_dir) if f.endswith(".png"))
        self._roidb_handler = self.gt_roidb

    def image_path_at(self, i):
        return osp.join(self._root, self._split, "image_02", self._sequence,
                        self._image_index[i] + ".png")

    def velodyne_path_at(self, i):
        return osp.join(self._root, self._split, "velodyne", self._sequence,
                        self._image_index[i] + ".bin")

    def _parse_labels(self):
        """label_02/<seq>.txt rows: frame track_id type trunc occl alpha
        x1 y1 x2 y2 h w l X Y Z ry."""
        path = osp.join(self._root, self._split, "label_02",
                        self._sequence + ".txt")
        per_frame = {}
        if not osp.exists(path):
            return per_frame
        with open(path) as f:
            for line in f:
                v = line.strip().split(" ")
                if len(v) < 17:
                    continue
                cls = self._class_to_ind.get(v[2])
                if cls is None:
                    continue
                per_frame.setdefault(int(v[0]), []).append(
                    (cls, [float(x) for x in v[3:17]]))
        return per_frame

    def gt_roidb(self):
        per_frame = self._parse_labels()
        roidb = []
        for idx in self._image_index:
            objs = per_frame.get(int(idx), [])
            n = len(objs)
            boxes = np.zeros((n, 4), np.float32)
            boxes3d_cam = np.zeros((n, 7), np.float32)
            gt_classes = np.zeros(n, np.int32)
            overlaps = np.zeros((n, self.num_classes), np.float32)
            for i, (cls, v) in enumerate(objs):
                boxes[i] = v[3:7]
                h, w, l = v[7:10]
                x, y, z = v[10:13]
                boxes3d_cam[i] = [x, y, z, l, w, h, v[13]]
                gt_classes[i] = cls
                overlaps[i, cls] = 1.0
            roidb.append({"boxes": boxes, "boxes_3D_cam": boxes3d_cam[:, :6],
                          "ry": boxes3d_cam[:, 6], "gt_classes": gt_classes,
                          "gt_overlaps": overlaps, "flipped": False})
        return roidb


class Coco(Imdb):
    """coco_<year>_<split>: instances JSON parsed with stdlib json
    (coco.py capability without the pycocotools dependency)."""

    def __init__(self, image_set, year, data_path):
        super().__init__("coco_{}_{}".format(year, image_set))
        self._data_path = data_path
        ann_file = osp.join(data_path, "annotations",
                            "instances_{}{}.json".format(image_set, year))
        with open(ann_file) as f:
            ann = json.load(f)
        cats = sorted(ann["categories"], key=lambda c: c["id"])
        self._classes = ("__background__",) + tuple(c["name"] for c in cats)
        self._cat_to_ind = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self._images = {im["id"]: im for im in ann["images"]}
        self._image_index = sorted(self._images)
        self._anns = {}
        for a in ann.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            self._anns.setdefault(a["image_id"], []).append(a)
        self._image_set = image_set
        self._year = year
        self._roidb_handler = self.gt_roidb

    def image_path_at(self, i):
        im = self._images[self._image_index[i]]
        return osp.join(self._data_path, "images", im["file_name"])

    def gt_roidb(self):
        roidb = []
        for img_id in self._image_index:
            anns = self._anns.get(img_id, [])
            n = len(anns)
            boxes = np.zeros((n, 4), np.float32)
            gt_classes = np.zeros(n, np.int32)
            overlaps = np.zeros((n, self.num_classes), np.float32)
            for i, a in enumerate(anns):
                x, y, w, h = a["bbox"]
                boxes[i] = [x, y, x + w - 1, y + h - 1]
                gt_classes[i] = self._cat_to_ind[a["category_id"]]
                overlaps[i, gt_classes[i]] = 1.0
            roidb.append({"boxes": boxes, "gt_classes": gt_classes,
                          "gt_overlaps": overlaps, "flipped": False})
        return roidb

    def evaluate_detections(self, all_boxes, output_dir="."):
        """Write COCO-format results json (bbox [x,y,w,h] + score)."""
        results = []
        ind_to_cat = {v: k for k, v in self._cat_to_ind.items()}
        for j in range(1, self.num_classes):
            for i, img_id in enumerate(self._image_index):
                dets = all_boxes[j][i]
                for k in range(len(dets)):
                    x1, y1, x2, y2, sc = dets[k][:5]
                    results.append({
                        "image_id": int(img_id),
                        "category_id": int(ind_to_cat[j]),
                        "bbox": [float(x1), float(y1),
                                 float(x2 - x1 + 1), float(y2 - y1 + 1)],
                        "score": float(sc)})
        os.makedirs(output_dir, exist_ok=True)
        path = osp.join(output_dir, "detections_{}{}_results.json".format(
            self._image_set, self._year))
        with open(path, "w") as f:
            json.dump(results, f)
        return path


class ImageListDataset(Imdb):
    """Inference-only drive imdb (nissan.py / nthu.py capability): an
    image directory or list file, no ground truth."""

    def __init__(self, name, image_dir, ext=".jpg", list_file=None):
        super().__init__(name)
        self._image_dir = image_dir
        self._classes = ("__background__", "Car")
        if list_file is not None:
            with open(list_file) as f:
                self._image_index = [l.strip() for l in f if l.strip()]
        else:
            self._image_index = sorted(
                osp.splitext(f)[0] for f in os.listdir(image_dir)
                if f.endswith(ext))
        self._ext = ext
        self._roidb_handler = self.gt_roidb

    def image_path_at(self, i):
        return osp.join(self._image_dir, self._image_index[i] + self._ext)

    def gt_roidb(self):
        return [{"boxes": np.zeros((0, 4), np.float32),
                 "gt_classes": np.zeros(0, np.int32),
                 "gt_overlaps": np.zeros((0, self.num_classes), np.float32),
                 "flipped": False} for _ in self._image_index]

    def evaluate_detections(self, all_boxes, output_dir="."):
        os.makedirs(output_dir, exist_ok=True)
        path = osp.join(output_dir, self.name + "_detections.txt")
        with open(path, "w") as f:
            for j in range(1, self.num_classes):
                for i, idx in enumerate(self._image_index):
                    for det in all_boxes[j][i]:
                        f.write("{} {} {:.2f} {:.2f} {:.2f} {:.2f} {:.4f}\n"
                                .format(idx, self._classes[j], *det[:5]))
        return path


def nissan(image_dir, **kw):
    return ImageListDataset("nissan", image_dir, **kw)


def nthu(image_dir, **kw):
    return ImageListDataset("nthu", image_dir, **kw)


class Pascal3D(PascalVOC):
    """pascal3d_<split>: VOC-style XML over the 12 rigid categories
    (pascal3d.py); viewpoint elements are carried through when present."""

    def __init__(self, image_set, devkit_path):
        super().__init__(image_set, "2012", devkit_path)
        self._name = "pascal3d_" + image_set
        self._classes = PASCAL3D_CLASSES
        self._class_to_ind = {c: i for i, c in enumerate(self._classes)}


class Imagenet3D(Pascal3D):
    """imagenet3d_<split> (imagenet3d.py) — same annotation scheme."""

    def __init__(self, image_set, devkit_path):
        super().__init__(image_set, devkit_path)
        self._name = "imagenet3d_" + image_set
