"""Native C++ evaluator (native/kitti_eval.cc) vs the numpy oracle
(data/kitti_eval.evaluate_ap_difficulty python loop)."""

import numpy as np
import pytest

from mv3d_tf_tpu.data import kitti_eval as KE
from mv3d_tf_tpu.utils.native import eval_ap_native, get_eval_lib


def _rand_frames(rng, n_frames, kind, max_d=25, max_g=12):
    frames = []
    D = 6 if kind == 1 else 4
    iou = KE.iou_3d_aabb if kind == 1 else KE.iou_2d
    for _ in range(n_frames):
        nd = rng.randint(0, max_d)
        ng = rng.randint(0, max_g)
        if kind == 1:
            lo_d = rng.rand(nd, 3) * 40
            lo_g = rng.rand(ng, 3) * 40
            dets = np.concatenate(
                [lo_d, lo_d + rng.rand(nd, 3) * 6 + 0.5], 1)
            gts = np.concatenate(
                [lo_g, lo_g + rng.rand(ng, 3) * 6 + 0.5], 1)
        else:
            xy_d = rng.rand(nd, 2) * 500
            xy_g = rng.rand(ng, 2) * 500
            dets = np.concatenate(
                [xy_d, xy_d + rng.rand(nd, 2) * 60 + 5], 1)
            gts = np.concatenate(
                [xy_g, xy_g + rng.rand(ng, 2) * 60 + 5], 1)
        # some detections exactly on gts so TPs exist at high IoU
        for d in range(min(nd, ng)):
            if rng.rand() < 0.5:
                dets[d, :D] = gts[d, :D] + rng.randn(D) * 0.5
        frames.append({
            "dets": dets.astype(np.float32),
            "scores": rng.rand(nd).astype(np.float32),
            "det_heights": (rng.rand(nd) * 80 + 5).astype(np.float32),
            "gts": gts.astype(np.float32),
            "levels": rng.randint(1, 5, ng).astype(np.int32),
            "iou": iou,
        })
    return frames


@pytest.mark.skipif(get_eval_lib() is None,
                    reason="no native toolchain")
@pytest.mark.parametrize("kind", [0, 1])
@pytest.mark.parametrize("difficulty", ["easy", "moderate", "hard"])
def test_native_matches_python(kind, difficulty):
    rng = np.random.RandomState(17 + kind)
    frames = _rand_frames(rng, 30, kind)
    thr = 0.5 if kind == 0 else 0.25
    py = KE.evaluate_ap_difficulty(frames, thr, difficulty,
                                   use_native=False)
    nat = KE.evaluate_ap_difficulty(frames, thr, difficulty,
                                    use_native=True)
    assert nat["num_gt"] == py["num_gt"]
    assert abs(nat["ap"] - py["ap"]) < 1e-9, (nat["ap"], py["ap"])


@pytest.mark.skipif(get_eval_lib() is None,
                    reason="no native toolchain")
def test_native_empty_cases():
    # no detections at all; no gts at all; empty frame list behavior
    f_nodet = [{"dets": np.zeros((0, 4), np.float32),
                "scores": np.zeros(0, np.float32),
                "det_heights": np.zeros(0, np.float32),
                "gts": np.array([[0, 0, 50, 50]], np.float32),
                "levels": np.array([1], np.int32), "iou": KE.iou_2d}]
    py = KE.evaluate_ap_difficulty(f_nodet, 0.5, "hard", use_native=False)
    nat = KE.evaluate_ap_difficulty(f_nodet, 0.5, "hard", use_native=True)
    assert py["ap"] == nat["ap"] == 0.0
    assert py["num_gt"] == nat["num_gt"] == 1

    ap, npos = eval_ap_native([], 0, 0.5, 25.0, 3) or (0.0, 0)
    assert ap == 0.0 and npos == 0


@pytest.mark.skipif(get_eval_lib() is None,
                    reason="no native toolchain")
def test_native_ignored_gt_and_short_det_rules():
    """A det matching only an ignored (level-4) gt is neither TP nor FP;
    a short unmatched det is ignored; both exactly as in python."""
    gt = np.array([[100, 100, 160, 160],     # level 4 -> ignored
                   [300, 300, 360, 360]], np.float32)
    dets = np.array([[100, 100, 160, 160],   # matches ignored gt
                     [300, 300, 360, 360],   # TP
                     [500, 10, 520, 20]], np.float32)  # short FP cand
    frames = [{"dets": dets,
               "scores": np.array([0.9, 0.8, 0.7], np.float32),
               "det_heights": np.array([61.0, 61.0, 11.0], np.float32),
               "gts": gt,
               "levels": np.array([4, 1], np.int32),
               "iou": KE.iou_2d}]
    for diff in ("easy", "hard"):
        py = KE.evaluate_ap_difficulty(frames, 0.7, diff,
                                       use_native=False)
        nat = KE.evaluate_ap_difficulty(frames, 0.7, diff,
                                        use_native=True)
        assert abs(nat["ap"] - py["ap"]) < 1e-12
        assert nat["ap"] == 1.0  # the short det is ignored, not FP
