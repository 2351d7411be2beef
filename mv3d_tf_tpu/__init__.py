"""mv3d_tf_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of MV3D.

A from-scratch framework with the capabilities of leeyevi/MV3D_TF
(multi-view 3D car detection on KITTI from LiDAR + camera), redesigned
TPU-first:

- the whole per-frame hot path (BEV rasterization, dual VGG trunks, RPN,
  proposal decoding, NMS, multi-view ROI pooling, fusion head) lives in a
  single jit-compiled XLA program — no host round-trips;
- all detection stages are fixed-shape with validity masks instead of the
  reference's dynamic-shape numpy `tf.py_func` escapes;
- multi-chip scaling is expressed with `jax.sharding.Mesh` + pjit
  (data-parallel frames over ICI), a capability the reference never had.

Reference layer map and parity notes: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from mv3d_tf_tpu.config import cfg, get_cfg, cfg_from_file, cfg_from_list  # noqa: F401
