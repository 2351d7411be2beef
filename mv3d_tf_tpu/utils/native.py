"""ctypes bindings for the native C++ host loader (native/mv3d_loader.cc).

Compiles the shared library on first use with g++ (cached under
native/build/) and falls back to the pure-numpy path transparently when
no toolchain is available.
"""

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_REPO = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))
_SRC = osp.join(_REPO, "native", "mv3d_loader.cc")
_BUILD = osp.join(_REPO, "native", "build")
_SO = osp.join(_BUILD, "libmv3d_loader.so")

_LIB = None
_TRIED = False


def _build_lib():
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not osp.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build_lib()
        lib = ctypes.CDLL(_SO)
        lib.load_velodyne_padded.restype = ctypes.c_long
        lib.load_velodyne_padded.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_long,
        ]
        lib.load_velodyne_batch.restype = None
        lib.load_velodyne_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
        ]
        _LIB = lib
    except Exception as e:              # toolchain missing: numpy fallback
        print("native loader unavailable ({}); using numpy fallback"
              .format(e))
        _LIB = None
    return _LIB


def load_velodyne_padded(path, bucket=131072):
    """One scan -> ((bucket,4) f32, (bucket,) bool). Native when possible."""
    lib = get_lib()
    if lib is None:
        from mv3d_tf_tpu.ops.bev import load_velodyne, pad_points
        return pad_points(load_velodyne(path), bucket)
    out = np.zeros((bucket, 4), np.float32)
    valid = np.zeros((bucket,), np.uint8)
    n = lib.load_velodyne_padded(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_long(bucket))
    if n < 0:
        raise IOError("failed to read " + path)
    return out, valid.astype(bool)


def load_velodyne_batch(paths, bucket=131072, n_threads=8):
    """Many scans -> ((N,bucket,4) f32, (N,bucket) bool), threaded native
    IO when available."""
    lib = get_lib()
    n = len(paths)
    if lib is None:
        outs, valids = zip(*(load_velodyne_padded(p, bucket) for p in paths))
        return np.stack(outs), np.stack(valids)
    out = np.zeros((n, bucket, 4), np.float32)
    valid = np.zeros((n, bucket), np.uint8)
    counts = np.zeros((n,), np.int64)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    lib.load_velodyne_batch(
        blob, ctypes.c_long(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_long(bucket),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.c_long(n_threads))
    if (counts < 0).any():
        bad = [paths[i] for i in np.where(counts < 0)[0]]
        raise IOError("failed to read: " + ", ".join(bad))
    return out, valid.astype(bool)


# ---------------------------------------------------------------------------
# Native KITTI official-protocol AP (native/kitti_eval.cc) — the C++
# twin of data/kitti_eval.evaluate_ap_difficulty's greedy-match loop.
# ---------------------------------------------------------------------------

_EVAL_SRC = osp.join(_REPO, "native", "kitti_eval.cc")
_EVAL_SO = osp.join(_BUILD, "libkitti_eval.so")
_EVAL_LIB = None
_EVAL_TRIED = False


def get_eval_lib():
    """Load (building if needed) the native evaluator, or None."""
    global _EVAL_LIB, _EVAL_TRIED
    if _EVAL_LIB is not None or _EVAL_TRIED:
        return _EVAL_LIB
    _EVAL_TRIED = True
    try:
        if (not osp.exists(_EVAL_SO)
                or os.path.getmtime(_EVAL_SO)
                < os.path.getmtime(_EVAL_SRC)):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _EVAL_SRC, "-o", _EVAL_SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_EVAL_SO)
        lib.kitti_eval_ap.restype = None
        lib.kitti_eval_ap.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # dets
            ctypes.POINTER(ctypes.c_int64),   # det_off
            ctypes.POINTER(ctypes.c_float),   # scores
            ctypes.POINTER(ctypes.c_float),   # det_h
            ctypes.POINTER(ctypes.c_float),   # gts
            ctypes.POINTER(ctypes.c_int64),   # gt_off
            ctypes.POINTER(ctypes.c_int32),   # levels
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),  # out[2]
        ]
        _EVAL_LIB = lib
    except Exception as e:              # toolchain missing: numpy fallback
        print("native evaluator unavailable ({}); using numpy fallback"
              .format(e))
        _EVAL_LIB = None
    return _EVAL_LIB


def eval_ap_native(frames, iou_kind, iou_thresh, min_h, lvl_max):
    """Run kitti_eval_ap over a list of frame dicts (see
    kitti_eval.evaluate_ap_difficulty for the schema). Returns
    (ap, npos) or None when the native library is unavailable."""
    lib = get_eval_lib()
    if lib is None:
        return None
    dgeom = 6 if iou_kind == 1 else 4

    def cat(key, width):
        parts = [np.asarray(fr[key], np.float32).reshape(-1, width)
                 if width else np.asarray(fr[key], np.float32).ravel()
                 for fr in frames]
        off = np.zeros(len(frames) + 1, np.int64)
        for i, p in enumerate(parts):
            off[i + 1] = off[i] + len(p)
        return (np.ascontiguousarray(np.concatenate(parts))
                if parts else np.zeros((0,), np.float32)), off

    dets, det_off = cat("dets", dgeom)
    scores, _ = cat("scores", 0)
    det_h, _ = cat("det_heights", 0)
    gts, gt_off = cat("gts", dgeom)
    levels = np.concatenate(
        [np.asarray(fr["levels"], np.int32).ravel() for fr in frames]
    ).astype(np.int32) if frames else np.zeros((0,), np.int32)
    out = np.zeros(2, np.float64)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    lib.kitti_eval_ap(
        fp(dets.reshape(-1)), det_off.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        fp(scores), fp(det_h),
        fp(gts.reshape(-1)), gt_off.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(frames)), ctypes.c_int32(dgeom),
        ctypes.c_int32(iou_kind), ctypes.c_float(iou_thresh),
        ctypes.c_float(min_h), ctypes.c_int32(lvl_max),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return float(out[0]), int(out[1])


# ---------------------------------------------------------------------------
# Native host BEV rasterizer (native/bev_raster.cc) — C++ twin of
# ops/bev.point_cloud_2_top_np for offline dataset preparation.
# ---------------------------------------------------------------------------

_BEV_SRC = osp.join(_REPO, "native", "bev_raster.cc")
_BEV_SO = osp.join(_BUILD, "libbev_raster.so")
_BEV_LIB = None
_BEV_TRIED = False


def get_bev_lib():
    global _BEV_LIB, _BEV_TRIED
    if _BEV_LIB is not None or _BEV_TRIED:
        return _BEV_LIB
    _BEV_TRIED = True
    try:
        if (not osp.exists(_BEV_SO)
                or os.path.getmtime(_BEV_SO)
                < os.path.getmtime(_BEV_SRC)):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", _BEV_SRC, "-o", _BEV_SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_BEV_SO)
        common = [ctypes.c_float] * 5 + [ctypes.c_double] * 2 + \
                 [ctypes.c_int32] * 6
        lib.bev_raster.restype = None
        lib.bev_raster.argtypes = (
            [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            + common + [ctypes.POINTER(ctypes.c_float)])
        lib.bev_raster_files.restype = None
        lib.bev_raster_files.argtypes = (
            [ctypes.c_char_p, ctypes.c_int64] + common
            + [ctypes.POINTER(ctypes.c_float),
               ctypes.POINTER(ctypes.c_int64), ctypes.c_int64])
        _BEV_LIB = lib
    except Exception as e:              # toolchain missing: numpy fallback
        print("native bev rasterizer unavailable ({}); numpy fallback"
              .format(e))
        _BEV_LIB = None
    return _BEV_LIB


def _bev_grid_args():
    from mv3d_tf_tpu.ops import bev as B
    from mv3d_tf_tpu.geometry import (BEV_C, BEV_H, BEV_W, HEIGHT_MAX,
                                      HEIGHT_MIN, N_SLICES, RES,
                                      TOP_X_MAX, TOP_X_MIN, TOP_Y_MAX,
                                      ZRES)
    return ([ctypes.c_float(RES), ctypes.c_float(ZRES),
             ctypes.c_float(TOP_X_MIN), ctypes.c_float(TOP_X_MAX),
             ctypes.c_float(TOP_Y_MAX),
             ctypes.c_double(HEIGHT_MIN), ctypes.c_double(HEIGHT_MAX),
             ctypes.c_int32(BEV_H), ctypes.c_int32(BEV_W),
             ctypes.c_int32(BEV_C), ctypes.c_int32(N_SLICES),
             ctypes.c_int32(B._X_SHIFT), ctypes.c_int32(B._Y_SHIFT)],
            (BEV_H, BEV_W, BEV_C))


def point_cloud_2_top_host(points):
    """(N,4) f32 points -> (601,601,9) f32 BEV raster. Native when
    available, else the numpy twin (bit-identical, tests/test_bev.py)."""
    lib = get_bev_lib()
    if lib is None:
        from mv3d_tf_tpu.ops.bev import point_cloud_2_top_np
        return point_cloud_2_top_np(np.asarray(points, np.float32))
    pts = np.ascontiguousarray(np.asarray(points, np.float32))
    args, shape = _bev_grid_args()
    out = np.zeros(shape, np.float32)
    lib.bev_raster(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)), *args,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bev_raster_files(paths, n_threads=8):
    """Read velodyne .bin files and rasterize each (threaded native IO).
    Returns (N, 601, 601, 9) f32. Falls back to numpy per file."""
    lib = get_bev_lib()
    if lib is None:
        return np.stack([point_cloud_2_top_host(
            np.fromfile(p, np.float32).reshape(-1, 4)) for p in paths])
    args, shape = _bev_grid_args()
    n = len(paths)
    out = np.zeros((n,) + shape, np.float32)
    counts = np.zeros((n,), np.int64)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    lib.bev_raster_files(
        blob, ctypes.c_int64(n), *args,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_threads))
    if (counts < 0).any():
        bad = [paths[i] for i in np.where(counts < 0)[0]]
        raise IOError("failed to read: " + ", ".join(bad))
    return out
