"""Host data loader: epoch-permuted cursor + fixed-shape minibatch blobs.

Replaces lib/roi_data_layer/layer.py (RoIDataLayer) + minibatch_mv3d.py:
same per-frame blobs (image_data, lidar_bv_data, calib, im_info, gt_*),
but padded to the static shapes the jit programs expect (MAX_GT gt slots,
an image padding bucket) plus validity masks, and with a background
prefetch thread that overlaps disk IO and host-side decode with
device compute (the reference's USE_PREFETCH flag is dead code,
config.py:101-103).

Images load as BGR float32 (cv2.imread parity — PIXEL_MEANS is BGR,
config.py:211).
"""

import queue
import threading

import numpy as np

from mv3d_tf_tpu.config import cfg


def load_image_bgr(path):
    from PIL import Image
    rgb = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return rgb[:, :, ::-1].astype(np.float32)      # BGR like cv2.imread


def pad_image(img, bucket=None):
    """Bottom/right zero-pad to the static bucket (same zero halo the
    SAME-padded convs would see)."""
    if bucket is None:
        bucket = cfg.TPU.IMAGE_SHAPE
    h, w = min(img.shape[0], bucket[0]), min(img.shape[1], bucket[1])
    out = np.zeros(bucket, np.float32)
    out[:h, :w] = img[:h, :w]
    return out


def pad_gt(entry, max_gt=None):
    """roidb entry -> fixed (MAX_GT, ...) gt blocks + validity mask.

    Blob semantics per minibatch_mv3d.py:49-70 (class appended as the
    last column of each gt blob).
    """
    if max_gt is None:
        max_gt = cfg.TPU.MAX_GT
    gt_inds = np.where(entry["gt_classes"] != 0)[0][:max_gt]
    n = len(gt_inds)
    bv = np.zeros((max_gt, 5), np.float32)
    b3 = np.zeros((max_gt, 7), np.float32)
    b3[:, 3:6] = 1.0          # keep log() finite on padded rows
    cnr = np.zeros((max_gt, 25), np.float32)
    boxes = np.zeros((max_gt, 5), np.float32)
    bv[:n, :4] = entry["boxes_bv"][gt_inds]
    bv[:n, 4] = entry["gt_classes"][gt_inds]
    b3[:n, :6] = entry["boxes_3D"][gt_inds]
    b3[:n, 6] = entry["gt_classes"][gt_inds]
    cnr[:n, :24] = entry["boxes_corners"][gt_inds]
    cnr[:n, 24] = entry["gt_classes"][gt_inds]
    boxes[:n, :4] = entry["boxes"][gt_inds]
    boxes[:n, 4] = entry["gt_classes"][gt_inds]
    valid = np.zeros(max_gt, bool)
    valid[:n] = True
    return {"gt_boxes": boxes, "gt_boxes_bv": bv, "gt_boxes_3d": b3,
            "gt_boxes_corners": cnr, "gt_valid": valid}


def get_minibatch(entry, image_bucket=None, max_gt=None):
    """One roidb entry -> the fixed-shape batch dict (minibatch_mv3d.py:17-76,
    mean subtraction moves in-graph)."""
    image = pad_image(load_image_bgr(entry["image_path"]), image_bucket)
    bev = np.load(entry["lidar_bv_path"]).astype(np.float32)
    batch = {"image": image, "bev": bev,
             "calib": entry["calib"].astype(np.float32),
             "im_info": np.array(
                 [[bev.shape[0], bev.shape[1], 1.0]], np.float32)}
    batch.update(pad_gt(entry, max_gt))
    return batch


class _PrefetchError:
    """Wrapper carrying a prefetch-worker exception to forward()."""

    def __init__(self, exc):
        self.exc = exc


class RoIDataLayer:
    """Epoch-permuted cursor over the roidb (roi_data_layer/layer.py:26-70)
    with optional background prefetch."""

    def __init__(self, roidb, num_classes=2, seed=None, prefetch=2):
        self._roidb = roidb
        self._num_classes = num_classes
        self._rng = np.random.RandomState(
            cfg.RNG_SEED if seed is None else seed)
        self._shuffle()
        self._queue = None
        if prefetch:
            self._queue = queue.Queue(maxsize=prefetch)
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()

    def _shuffle(self):
        self._perm = self._rng.permutation(np.arange(len(self._roidb)))
        self._cur = 0

    def _next_index(self):
        if self._cur >= len(self._roidb):
            self._shuffle()
        i = self._perm[self._cur]
        self._cur += 1
        return i

    def next_index(self):
        """Advance the epoch-permuted cursor WITHOUT loading blobs —
        the device-resident dataset path (solver._build_device_dataset)
        only needs the frame index; the permutation sequence is identical
        to forward()'s."""
        return self._next_index()

    def _load_next(self):
        return get_minibatch(self._roidb[self._next_index()])

    def _worker(self):
        while True:
            try:
                item = self._load_next()
            except BaseException as e:  # propagate IO errors to forward()
                self._queue.put(_PrefetchError(e))
                return
            self._queue.put(item)

    def forward(self):
        if self._queue is not None:
            item = self._queue.get()
            if isinstance(item, _PrefetchError):
                raise RuntimeError(
                    "prefetch worker died: {!r}".format(item.exc)) \
                    from item.exc
            return item
        return self._load_next()
