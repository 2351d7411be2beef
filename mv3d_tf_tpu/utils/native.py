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
