"""Fixed-shape greedy NMS, fully in-graph.

Replaces the reference's host NMS stack (lib/nms/cpu_nms.pyx:17-68 greedy
CPU, lib/nms/nms_kernel.cu bitmask GPU, lib/fast_rcnn/nms_wrapper.py
dispatch) with a jit-pure lax.fori_loop that produces the EXACT same keep
set as the Cython greedy algorithm (suppression when IoU >= thresh,
+1 area convention), padded to a static output size with a validity mask.

The loop runs max_out sequential steps; each step is one O(N) vector op
(select best remaining, suppress its neighborhood), so there is no O(N^2)
IoU matrix in memory and no host round-trip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu.ops.iou import iou_one_to_many

NEG_INF = jnp.float32(-1e30)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_matrix(boxes, scores, valid, max_out, iou_threshold=0.7):
    """Exact greedy NMS via fixpoint iteration on the sorted IoU mask.

    Replaces the O(max_out) sequential scan with a handful of (N,)x(N,N)
    mask products: sort by score, build the strict-upper-triangular
    suppression mask (i suppresses j>i when IoU >= thresh), then iterate
      kept[j] <- valid[j] & no kept i<j suppresses j
    until fixpoint. Converges to the EXACT greedy keep set (each
    iteration finalizes at least one more suppression-chain level; the
    while_loop exits as soon as nothing changes — typically 3-6 rounds).
    Same keep-set semantics as cpu_nms.pyx:17-68 / the scan version.

    Memory: the N x N bool mask (e.g. 6000^2 = 36 MB) — use the scan
    version if N is huge and memory-constrained.
    """
    from mv3d_tf_tpu.ops.iou import bbox_overlaps

    boxes = jnp.asarray(boxes, jnp.float32)
    n = boxes.shape[0]
    active = valid & jnp.isfinite(scores)
    masked_scores = jnp.where(active, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    boxes_s = boxes[order]
    valid_s = active[order]

    iou = bbox_overlaps(boxes_s, boxes_s)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    sup = ((iou >= iou_threshold) & (i_idx < j_idx)
           & valid_s[:, None] & valid_s[None, :]).astype(jnp.float32)

    def body(state):
        kept, _ = state
        hit = jnp.matmul(kept.astype(jnp.float32), sup,
                         precision=jax.lax.Precision.DEFAULT)
        new = valid_s & (hit < 0.5)
        return new, kept

    def cond(state):
        kept, prev = state
        return jnp.any(kept != prev)

    kept, _ = jax.lax.while_loop(cond, body, (valid_s, ~valid_s))

    # pack the first max_out kept (already score-ordered) into fixed slots
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    slot = jnp.where(kept & (rank < max_out), rank, max_out)
    keep_idx = (jnp.zeros((max_out + 1,), jnp.int32)
                .at[slot].set(order.astype(jnp.int32))[:max_out])
    n_kept = jnp.minimum(jnp.sum(kept), max_out)
    keep_valid = jnp.arange(max_out) < n_kept
    return keep_idx * keep_valid, keep_valid


@functools.partial(jax.jit,
                   static_argnames=("max_out", "block", "presorted",
                                    "rounds"))
def nms_blocked_fixed(boxes, scores, valid, max_out, iou_threshold=0.7,
                      block=512, presorted=False, rounds=16):
    """nms_blocked with the intra-block fixpoint unrolled to a FIXED
    trip count (lax.fori_loop) instead of a data-dependent while_loop.

    Motivation (r4 fault bisection, experiments/results/r4/fault_*.log):
    nms_blocked's data-dependent while_loops co-scheduled with the
    Pallas ROI pool in one jit fault the TPU worker deterministically;
    fixed-trip-count loops (the fori NMS) in the identical graph are
    clean. This variant keeps the blocked formulation's speed (one
    (block x N) strip per scan step instead of max_out sequential
    argmax steps) while using only fixed-shape, fixed-trip control flow.

    Exactness: the fixpoint finalizes one suppression-chain level per
    round, so the keep set is the EXACT greedy set whenever every
    intra-block chain is <= `rounds` deep. Real score-sorted proposal
    blocks converge in 3-6 rounds (measured, ops/nms.py fixpoint
    documentation); `rounds=16` gives ~3x margin at negligible cost
    (one (block,block) mask product per round). The third return value
    `converged` is an in-graph guarantee check: True iff one more
    round would change nothing in any block, i.e. the result is
    certified equal to the greedy oracle. Callers surface it
    (eval.build_detect_batch_fn -> "nms_converged") and the on-chip
    selfcheck asserts it on the shipping workload.

    Returns (keep_idx (max_out,), keep_valid (max_out,), converged ()).
    """
    return _nms_blocked_core(boxes, scores, valid, max_out, iou_threshold,
                             block, presorted, rounds)


@functools.partial(jax.jit, static_argnames=("max_out", "block", "presorted"))
def nms_blocked(boxes, scores, valid, max_out, iou_threshold=0.7,
                block=512, presorted=False):
    """Exact greedy NMS via a scan over score-sorted BLOCKS — the
    TPU-native shape of the reference's bitmask GPU kernel
    (lib/nms/nms_kernel.cu:34-78): resolve each block internally, then
    one (block x N) IoU sweep suppresses the tail. Never materializes
    the N x N matrix (nms_matrix's (6000^2) mask costs ~144 MB/frame of
    HBM traffic per fixpoint round); work is streamed in (block, N)
    strips. Same keep set as cpu_nms.pyx:17-68.

    presorted=True promises the caller already ordered boxes/scores by
    descending score with all invalid entries trailing (exactly what
    top_k_by_score emits) — the internal argsort is skipped. Besides
    being redundant work, a second sort stacked on lax.top_k in one
    batched program sends the axon remote compiler into minutes-long
    schedules that can trip the TPU worker watchdog.

    Returns (keep_idx (max_out,), keep_valid (max_out,)) like nms().
    """
    keep_idx, keep_valid, _ = _nms_blocked_core(
        boxes, scores, valid, max_out, iou_threshold, block, presorted,
        rounds=None)
    return keep_idx, keep_valid


def _nms_blocked_core(boxes, scores, valid, max_out, iou_threshold,
                      block, presorted, rounds):
    """Shared blocked-NMS body. rounds=None -> exact while_loop fixpoint
    per block (converged is constant True); rounds=int -> fixed fori_loop
    trip count + a real convergence certificate (see nms_blocked_fixed)."""
    from mv3d_tf_tpu.ops.iou import bbox_overlaps

    boxes = jnp.asarray(boxes, jnp.float32)
    n = boxes.shape[0]
    bs = min(block, n)
    nblk = -(-n // bs)
    pad = nblk * bs - n

    active = valid & jnp.isfinite(scores)
    if presorted:
        order = jnp.arange(n, dtype=jnp.int32)
        boxes_s = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid_s = jnp.pad(active, (0, pad))
    else:
        masked_scores = jnp.where(active, scores, NEG_INF)
        order = jnp.argsort(-masked_scores)
        boxes_s = jnp.pad(boxes[order], ((0, pad), (0, 0)))
        valid_s = jnp.pad(active[order], (0, pad))

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    upper = i_idx < j_idx

    def blk(carry, start):
        supp, okflag = carry
        bb = jax.lax.dynamic_slice(boxes_s, (start, 0), (bs, 4))
        bvalid = (jax.lax.dynamic_slice(valid_s, (start,), (bs,))
                  & ~jax.lax.dynamic_slice(supp, (start,), (bs,)))
        # intra-block exact greedy: fixpoint on the bs x bs mask (tiny)
        iou_bb = bbox_overlaps(bb, bb)
        sup_bb = ((iou_bb >= iou_threshold) & upper
                  & bvalid[:, None] & bvalid[None, :])

        def step(kept):
            hit = jnp.any(kept[:, None] & sup_bb, axis=0)
            return bvalid & ~hit

        if rounds is None:
            def body(state):
                kept, _ = state
                return step(kept), kept

            def cond(state):
                kept, prev = state
                return jnp.any(kept != prev)

            kept_bb, _ = jax.lax.while_loop(cond, body, (bvalid, ~bvalid))
            ok = jnp.bool_(True)
        else:
            kept_bb = jax.lax.fori_loop(
                0, rounds, lambda _, kept: step(kept), bvalid)
            # certificate: one more round is a no-op <=> the fixpoint
            # was reached <=> exact greedy keep set (see docstring)
            ok = jnp.all(step(kept_bb) == kept_bb)

        # kept boxes of this block suppress everything behind them;
        # writes to already-decided positions are never read again
        iou_bt = bbox_overlaps(bb, boxes_s)              # (bs, N)
        hit_t = jnp.any(kept_bb[:, None] & (iou_bt >= iou_threshold),
                        axis=0)
        supp = supp | hit_t
        return (supp, okflag & ok), kept_bb

    starts = jnp.arange(nblk) * bs
    (_, converged), kept_blocks = jax.lax.scan(
        blk, (jnp.zeros((nblk * bs,), bool), jnp.bool_(True)), starts)
    kept = kept_blocks.reshape(-1)[:n]

    # pack the first max_out kept (already score-ordered) into fixed slots
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    slot = jnp.where(kept & (rank < max_out), rank, max_out)
    keep_idx = (jnp.zeros((max_out + 1,), jnp.int32)
                .at[slot].set(order[:n].astype(jnp.int32))[:max_out])
    n_kept = jnp.minimum(jnp.sum(kept), max_out)
    keep_valid = jnp.arange(max_out) < n_kept
    return keep_idx * keep_valid, keep_valid, converged


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes, scores, valid, max_out, iou_threshold=0.7):
    """Greedy NMS with static shapes.

    Args:
      boxes: (N, 4) float32 [x1,y1,x2,y2].
      scores: (N,) float32.
      valid: (N,) bool — padded/filtered entries never win.
      max_out: static int, number of output slots (post-NMS top-N).
      iou_threshold: suppress when IoU >= this (cpu_nms.pyx:65 semantics).

    Returns:
      keep_idx: (max_out,) int32 indices into the input arrays (0 when
        the slot is unused), keep_valid: (max_out,) bool.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    n = boxes.shape[0]
    active = valid & jnp.isfinite(scores)
    masked_scores = jnp.where(active, scores, NEG_INF)

    def body(i, carry):
        act, msk, keep_idx, keep_val = carry
        best = jnp.argmax(msk)                   # highest remaining score
        found = msk[best] > NEG_INF
        iou = iou_one_to_many(boxes[best], boxes)
        # suppress the chosen box and everything with IoU >= thresh
        sup = found & (iou >= iou_threshold)
        act2 = act & ~sup
        msk2 = jnp.where(act2, msk, NEG_INF)
        keep_idx = keep_idx.at[i].set(jnp.where(found, best, 0).astype(jnp.int32))
        keep_val = keep_val.at[i].set(found)
        return act2, msk2, keep_idx, keep_val

    init = (active, masked_scores,
            jnp.zeros((max_out,), jnp.int32),
            jnp.zeros((max_out,), bool))
    _, _, keep_idx, keep_val = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_val


def nms_np(dets, thresh):
    """Host greedy oracle with the exact cpu_nms.pyx semantics (tests /
    tiny host-side paths). dets: (N,5) [x1,y1,x2,y2,score] -> keep list."""
    x1, y1, x2, y2, scores = (dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3],
                              dets[:, 4])
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(dets.shape[0], bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas - inter)
        suppressed |= ovr >= thresh
    return keep


def nms_new_np(dets, thresh):
    """The reference's nms_new variant (lib/utils/nms.pyx:70-123): also
    suppresses near-containment (inter/area > 0.95 either way)."""
    x1, y1, x2, y2, scores = (dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3],
                              dets[:, 4])
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(dets.shape[0], bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas - inter)
        ovr1 = inter / areas
        ovr2 = inter / areas[i]
        suppressed |= (ovr >= thresh) | (ovr1 > 0.95) | (ovr2 > 0.95)
    return keep


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_by_score(scores, valid, k):
    """Score-ordered top-k with validity propagation (the reference's
    argsort + [:pre_nms_topN] step, proposal_layer_tf.py:161-167)."""
    masked = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    return idx.astype(jnp.int32), vals > NEG_INF
