"""NMS keep-set equivalence vs the greedy Cython-semantics oracle,
and IoU matrix vs a loop oracle."""

import numpy as np

from mv3d_tf_tpu.ops.iou import bbox_overlaps
from mv3d_tf_tpu.ops.nms import nms, nms_np, top_k_by_score


def _rand_dets(rng, n, span=200.0):
    x1 = rng.uniform(0, span, n)
    y1 = rng.uniform(0, span, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    # unique scores so greedy ordering is unambiguous across sort algorithms
    scores = rng.permutation(n).astype(np.float32) / n + 0.001
    return np.stack([x1, y1, x1 + w, y1 + h, scores], 1).astype(np.float32)


def _iou_oracle(boxes, query):
    out = np.zeros((len(boxes), len(query)))
    for k, q in enumerate(query):
        qa = (q[2] - q[0] + 1) * (q[3] - q[1] + 1)
        for n, b in enumerate(boxes):
            iw = min(b[2], q[2]) - max(b[0], q[0]) + 1
            ih = min(b[3], q[3]) - max(b[1], q[1]) + 1
            if iw > 0 and ih > 0:
                ba = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
                out[n, k] = iw * ih / (ba + qa - iw * ih)
    return out


def test_bbox_overlaps_oracle(rng):
    boxes = _rand_dets(rng, 40)[:, :4]
    query = _rand_dets(rng, 17)[:, :4]
    got = np.asarray(bbox_overlaps(boxes, query))
    np.testing.assert_allclose(got, _iou_oracle(boxes, query), rtol=1e-5)


def test_nms_matches_greedy_oracle(rng):
    for trial in range(5):
        dets = _rand_dets(rng, 200, span=150.0)   # dense -> many suppressions
        for thresh in (0.3, 0.5, 0.7):
            exp = nms_np(dets, thresh)
            idx, val = nms(dets[:, :4], dets[:, 4],
                           np.ones(len(dets), bool), 200, thresh)
            got = list(np.asarray(idx)[np.asarray(val)])
            assert got == exp, f"trial {trial} thresh {thresh}"


def test_nms_respects_valid_mask(rng):
    dets = _rand_dets(rng, 50)
    valid = np.zeros(50, bool)
    valid[:10] = True
    idx, val = nms(dets[:, :4], dets[:, 4], valid, 50, 0.5)
    kept = np.asarray(idx)[np.asarray(val)]
    assert set(kept) <= set(range(10))
    exp = nms_np(dets[:10], 0.5)
    assert list(kept) == exp


def test_nms_max_out_truncates(rng):
    dets = _rand_dets(rng, 100, span=5000.0)      # sparse -> few suppressions
    exp = nms_np(dets, 0.7)[:10]
    idx, val = nms(dets[:, :4], dets[:, 4], np.ones(100, bool), 10, 0.7)
    assert list(np.asarray(idx)[np.asarray(val)]) == exp
    assert np.asarray(val).all()


def test_nms_all_invalid():
    boxes = np.zeros((8, 4), np.float32)
    idx, val = nms(boxes, np.zeros(8, np.float32), np.zeros(8, bool), 4, 0.5)
    assert not np.asarray(val).any()


def test_nms_identical_boxes():
    # all-same boxes: exactly one survivor regardless of threshold
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (20, 1))
    scores = np.arange(20, dtype=np.float32)
    idx, val = nms(boxes, scores, np.ones(20, bool), 20, 0.99)
    kept = np.asarray(idx)[np.asarray(val)]
    assert list(kept) == [19]


def test_top_k_by_score(rng):
    scores = rng.rand(100).astype(np.float32)
    valid = rng.rand(100) > 0.3
    idx, val = top_k_by_score(scores, valid, 20)
    idx, val = np.asarray(idx), np.asarray(val)
    n_valid = min(20, valid.sum())
    assert val[:n_valid].all() and not val[n_valid:].any()
    exp = np.argsort(np.where(valid, scores, -np.inf))[::-1][:n_valid]
    np.testing.assert_array_equal(idx[:n_valid], exp)


def test_nms_matrix_matches_greedy_oracle(rng):
    from mv3d_tf_tpu.ops.nms import nms_matrix
    for trial in range(5):
        dets = _rand_dets(rng, 200, span=150.0)
        for thresh in (0.3, 0.5, 0.7):
            exp = nms_np(dets, thresh)
            idx, val = nms_matrix(dets[:, :4], dets[:, 4],
                                  np.ones(len(dets), bool), 200, thresh)
            got = list(np.asarray(idx)[np.asarray(val)])
            assert got == exp, f"trial {trial} thresh {thresh}"


def test_nms_matrix_cascade_and_masks(rng):
    from mv3d_tf_tpu.ops.nms import nms_matrix
    # suppression chain: greedy must keep [0, 2]
    boxes = np.array([[0, 0, 100, 100], [60, 0, 160, 100],
                      [120, 0, 220, 100]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, val = nms_matrix(boxes, scores, np.ones(3, bool), 3, 0.2)
    assert list(np.asarray(idx)[np.asarray(val)]) == [0, 2]
    # deep chain (worst case for fixpoint iteration)
    n = 30
    boxes = np.stack([np.arange(n) * 60.0, np.zeros(n),
                      np.arange(n) * 60.0 + 100, np.full(n, 100.0)],
                     1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    idx, val = nms_matrix(boxes, scores, np.ones(n, bool), n, 0.2)
    exp = nms_np(np.hstack([boxes, scores[:, None]]), 0.2)
    assert list(np.asarray(idx)[np.asarray(val)]) == exp
    # validity mask respected + truncation
    valid = np.zeros(n, bool); valid[:10] = True
    idx, val = nms_matrix(boxes, scores, valid, 4, 0.2)
    exp = nms_np(np.hstack([boxes[:10], scores[:10, None]]), 0.2)[:4]
    assert list(np.asarray(idx)[np.asarray(val)]) == exp


def test_nms_blocked_matches_greedy_oracle(rng):
    from mv3d_tf_tpu.ops.nms import nms_blocked
    for trial in range(3):
        dets = _rand_dets(rng, 300, span=150.0)
        for thresh in (0.3, 0.7):
            exp = nms_np(dets, thresh)
            # multi-block path: block=64 -> 5 blocks over 300 boxes
            idx, val = nms_blocked(dets[:, :4], dets[:, 4],
                                   np.ones(len(dets), bool), 300, thresh,
                                   block=64)
            got = list(np.asarray(idx)[np.asarray(val)])
            assert got == exp, f"trial {trial} thresh {thresh}"


def test_nms_blocked_presorted_matches_unsorted(rng):
    from mv3d_tf_tpu.ops.nms import nms_blocked
    dets = _rand_dets(rng, 300, span=150.0)
    order = np.argsort(-dets[:, 4])
    sdets = dets[order]
    exp = nms_np(dets, 0.5)
    idx, val = nms_blocked(sdets[:, :4], sdets[:, 4],
                           np.ones(len(sdets), bool), 300, 0.5,
                           block=64, presorted=True)
    got = [int(order[i]) for i in np.asarray(idx)[np.asarray(val)]]
    assert got == exp


def test_nms_blocked_presorted_trailing_invalid(rng):
    from mv3d_tf_tpu.ops.nms import nms_blocked
    # top_k_by_score contract: valid entries sorted desc, invalid trail
    # (their score slots hold arbitrary garbage, incl. high values)
    dets = _rand_dets(rng, 100, span=120.0)
    order = np.argsort(-dets[:, 4])
    sdets = dets[order]
    valid = np.ones(100, bool)
    valid[60:] = False
    sdets[60:, 4] = 99.0  # garbage scores must be ignored when invalid
    exp = nms_np(np.hstack([sdets[:60, :4], sdets[:60, 4:5]]), 0.5)
    idx, val = nms_blocked(sdets[:, :4], sdets[:, 4], valid, 100, 0.5,
                           block=32, presorted=True)
    got = list(np.asarray(idx)[np.asarray(val)])
    assert got == exp


def test_nms_blocked_fixed_matches_oracle_when_certified(rng):
    from mv3d_tf_tpu.ops.nms import nms_blocked_fixed
    for trial in range(3):
        dets = _rand_dets(rng, 300, span=150.0)
        for thresh in (0.3, 0.7):
            exp = nms_np(dets, thresh)
            idx, val, ok = nms_blocked_fixed(
                dets[:, :4], dets[:, 4], np.ones(len(dets), bool), 300,
                thresh, block=64, rounds=64)
            assert bool(ok), "rounds=block must always certify"
            got = list(np.asarray(idx)[np.asarray(val)])
            assert got == exp, f"trial {trial} thresh {thresh}"


def test_nms_blocked_fixed_certificate_catches_deep_chains():
    from mv3d_tf_tpu.ops.nms import nms_blocked_fixed
    # suppression chain: box i overlaps ONLY box i+1 (step 10, extent 29
    # -> adjacent IoU = 20/40 = 0.5, distance-2 IoU = 10/50 = 0.2),
    # scores strictly descending -> greedy keeps the evens; the decision
    # for box k needs ~k/2 fixpoint rounds. rounds=2 must refuse to
    # certify; rounds=32 must certify AND match the oracle.
    n = 24
    boxes = np.stack([np.arange(n) * 10.0, np.zeros(n),
                      np.arange(n) * 10.0 + 29.0, np.ones(n) * 50.0],
                     1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]])
    exp = nms_np(dets, 0.5)
    assert exp == list(range(0, n, 2))  # sanity: the chain is real

    idx, val, ok = nms_blocked_fixed(boxes, scores, np.ones(n, bool), n,
                                     0.5, block=n, rounds=2)
    assert not bool(ok), "2 rounds cannot certify a depth-12 chain"
    idx, val, ok = nms_blocked_fixed(boxes, scores, np.ones(n, bool), n,
                                     0.5, block=n, rounds=32)
    assert bool(ok)
    assert list(np.asarray(idx)[np.asarray(val)]) == exp


def test_nms_blocked_fixed_default_rounds_on_realistic_boxes(rng):
    from mv3d_tf_tpu.ops.nms import nms_blocked_fixed
    # the shipping default (rounds=16, block=512) on dense random boxes:
    # must certify AND match greedy (chains on realistic data are 3-6)
    dets = _rand_dets(rng, 600, span=150.0)
    exp = nms_np(dets, 0.7)
    idx, val, ok = nms_blocked_fixed(dets[:, :4], dets[:, 4],
                                     np.ones(len(dets), bool), 600, 0.7)
    assert bool(ok)
    assert list(np.asarray(idx)[np.asarray(val)]) == exp


def test_proposal_layer_blocked_fixed_matches_fori(rng):
    """proposal_layer_3d(nms_impl='blocked_fixed') must emit the same
    rois as the fori path plus a certified nms_converged flag."""
    import jax.numpy as jnp
    from mv3d_tf_tpu.proposals import proposal_layer_3d

    H = W = 20
    A = 4
    prob = rng.rand(1, H, W, 2 * A).astype(np.float32)
    deltas = (rng.rand(1, H, W, 6 * A).astype(np.float32) - 0.5) * 0.2
    calib = np.zeros((4, 12), np.float32)
    calib[0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                0, 0, 1.0, 0.005]
    calib[2, :9] = np.eye(3, dtype=np.float32).reshape(-1)
    calib[3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    kw = dict(pre_nms_top_n=256, post_nms_top_n=64, nms_thresh=0.7)
    ref = proposal_layer_3d(prob, deltas, calib, H, W, **kw)
    got = proposal_layer_3d(prob, deltas, calib, H, W,
                            nms_impl="blocked_fixed", **kw)
    assert bool(got["nms_converged"])
    for k in ("rois_bv", "rois_img", "rois_3d", "scores", "valid"):
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(ref[k], np.float32),
                                   rtol=1e-6, atol=1e-6)
