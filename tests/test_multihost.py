"""Multi-host eval sharding: N processes produce byte-identical
detections.pkl to single-process (parallel/multihost.py).

The cross-PROCESS part runs a cheap deterministic fake detector via a
small driver script (the real model path is covered by the eval/golden
tests; what sharding must guarantee is index splitting + merge
fidelity, which is model-independent)."""

import os
import pickle
import subprocess
import sys

import numpy as np

from mv3d_tf_tpu.parallel.multihost import (merge_shards, run_host_shard,
                                            shard_indices)

_DRIVER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mv3d_tf_tpu.config import cfg
from mv3d_tf_tpu.data.kitti import KittiMV3D, prepare_roidb
from mv3d_tf_tpu.parallel.multihost import run_host_shard
cfg.ROOT_DIR = sys.argv[1]
root, host_id, host_count = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
imdb = KittiMV3D("train", kitti_path=root)
prepare_roidb(imdb)

def fake_detect(params, bev, image, calib):
    # deterministic per-frame output derived from the inputs
    s = float(np.asarray(bev).sum()) % 7.0
    P = 4
    return {"scores": np.full((P, 2), 0.1 + s / 10.0, np.float32),
            "boxes_bv": np.tile(np.arange(8, dtype=np.float32) * (1 + s),
                                (P, 1)),
            "boxes_cnr": np.zeros((P, 48), np.float32) + s,
            "boxes_cnr_r": np.ones((P, 48), np.float32) * s,
            "rois_3d": np.zeros((P, 7), np.float32),
            "valid": np.ones((P,), bool)}

run_host_shard(None, imdb, host_id, host_count, detect_fn=fake_detect,
               log=lambda *a: None)
print("SHARD_OK")
"""


def test_shard_indices_cover_and_balance():
    for n, h in ((10, 3), (8, 8), (5, 2), (7, 1)):
        all_idx = []
        sizes = []
        for i in range(h):
            s = shard_indices(n, i, h)
            all_idx.extend(s)
            sizes.append(len(s))
        assert sorted(all_idx) == list(range(n))
        assert max(sizes) - min(sizes) <= 1


def test_two_process_merge_matches_single(tmp_path):
    from mv3d_tf_tpu.config import cfg, get_output_dir
    from mv3d_tf_tpu.data import synthetic
    from mv3d_tf_tpu.data.kitti import KittiMV3D, prepare_roidb
    from mv3d_tf_tpu.solver import test_net

    root = tmp_path / "kitti"
    synthetic.generate(str(root), num_frames=5, cars_per_frame=2, seed=7)
    old_root = cfg.ROOT_DIR
    cfg.ROOT_DIR = str(tmp_path)
    try:
        imdb = KittiMV3D("train", kitti_path=str(root))
        prepare_roidb(imdb)

        def fake_detect(params, bev, image, calib):
            s = float(np.asarray(bev).sum()) % 7.0
            P = 4
            return {"scores": np.full((P, 2), 0.1 + s / 10.0, np.float32),
                    "boxes_bv": np.tile(
                        np.arange(8, dtype=np.float32) * (1 + s), (P, 1)),
                    "boxes_cnr": np.zeros((P, 48), np.float32) + s,
                    "boxes_cnr_r": np.ones((P, 48), np.float32) * s,
                    "rois_3d": np.zeros((P, 7), np.float32),
                    "valid": np.ones((P,), bool)}

        # single-process reference
        test_net(None, imdb, detect_fn=fake_detect, log=lambda *a: None)
        out_dir = get_output_dir(imdb, "default")
        with open(os.path.join(out_dir, "detections.pkl"), "rb") as f:
            single = f.read()

        # two real processes, then merge
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        for h in range(2):
            proc = subprocess.run(
                [sys.executable, "-c", _DRIVER, str(tmp_path), str(root),
                 str(h), "2"],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                env=env, capture_output=True, text=True, timeout=300)
            assert proc.returncode == 0, proc.stderr[-1500:]
            assert "SHARD_OK" in proc.stdout
        merge_shards(imdb, 2, log=lambda *a: None, evaluate=False)
        with open(os.path.join(out_dir, "detections.pkl"), "rb") as f:
            merged = f.read()
        assert merged == single  # byte-identical
    finally:
        cfg.ROOT_DIR = old_root
