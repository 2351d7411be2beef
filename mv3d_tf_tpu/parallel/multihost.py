"""Multi-host evaluation sharding — frames split per host over DCN.

The reference's eval loop is embarrassingly frame-parallel
(test_mv.py:394); multi-host scaling needs no collectives at all: each
host evaluates a contiguous frame shard with its local chips, writes a
shard pickle, and one merge pass concatenates the shards into the exact
single-process detections.pkl (byte-identical — slots carry global frame
indices, nothing is reordered or rescored).

Driver surface (tools/test_net.py):
  host i:   test_net.py ... --host_id i --host_count N
  merge:    test_net.py ... --host_count N --merge_shards
The merge also runs imdb.evaluate_detections on the merged results, so
AP comes out once, computed over the full split.
"""

import os
import pickle

import numpy as np


def shard_indices(num_items, host_id, host_count):
    """Contiguous per-host frame ranges (balanced to within one frame)."""
    assert 0 <= host_id < host_count, (host_id, host_count)
    base = num_items // host_count
    extra = num_items % host_count
    start = host_id * base + min(host_id, extra)
    size = base + (1 if host_id < extra else 0)
    return list(range(start, start + size))


def shard_path(output_dir, host_id, host_count):
    return os.path.join(output_dir,
                        "detections_shard_{}_of_{}.pkl".format(
                            host_id, host_count))


def run_host_shard(params, imdb, host_id, host_count,
                   weights_filename="default", **test_kwargs):
    """Evaluate this host's frame shard and write the shard pickle."""
    from mv3d_tf_tpu.config import get_output_dir
    from mv3d_tf_tpu.solver import test_net

    indices = shard_indices(imdb.num_images, host_id, host_count)
    all_boxes, all_cnr = test_net(
        params, imdb, weights_filename=weights_filename,
        frame_indices=indices, evaluate=False, **test_kwargs)
    output_dir = get_output_dir(imdb, weights_filename)
    os.makedirs(output_dir, exist_ok=True)
    payload = {
        "host_id": host_id, "host_count": host_count, "indices": indices,
        "boxes": [[all_boxes[c][i] for i in indices]
                  for c in range(imdb.num_classes)],
        "boxes_cnr": [[all_cnr[c][i] for i in indices]
                      for c in range(imdb.num_classes)],
    }
    path = shard_path(output_dir, host_id, host_count)
    with open(path, "wb") as f:
        pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
    return path


def merge_shards(imdb, host_count, weights_filename="default",
                 evaluate=True, log=print):
    """Merge all shard pickles into detections(.cnr).pkl and evaluate.

    Returns (all_boxes, all_boxes_cnr); the written pickles are
    byte-identical to a single-process test_net run.
    """
    from mv3d_tf_tpu.config import get_output_dir

    output_dir = get_output_dir(imdb, weights_filename)
    k = imdb.num_classes
    n = imdb.num_images
    all_boxes = [[[] for _ in range(n)] for _ in range(k)]
    all_cnr = [[[] for _ in range(n)] for _ in range(k)]
    def norm(v):
        # rebuild arrays with the CANONICAL float32 dtype instance so the
        # merged pickle is byte-identical to the single-process one:
        # unpickled arrays carry fresh dtype objects, which defeats the
        # pickler's memoization and yields an equivalent-but-different
        # byte stream (np.array(v, np.float32) would reuse v's dtype)
        if not len(v):
            return v
        out = np.empty(np.shape(v), np.dtype(np.float32))
        out[...] = v
        return out

    seen = np.zeros(n, bool)
    for h in range(host_count):
        path = shard_path(output_dir, h, host_count)
        with open(path, "rb") as f:
            payload = pickle.load(f)
        assert payload["host_count"] == host_count, path
        for c in range(k):
            for j, i in enumerate(payload["indices"]):
                all_boxes[c][i] = norm(payload["boxes"][c][j])
                all_cnr[c][i] = norm(payload["boxes_cnr"][c][j])
        seen[payload["indices"]] = True
    assert seen.all(), "missing frames after merge: {}".format(
        np.where(~seen)[0][:10])

    with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(output_dir, "detections_cnr.pkl"), "wb") as f:
        pickle.dump(all_cnr, f, pickle.HIGHEST_PROTOCOL)
    if evaluate:
        log("Evaluating merged detections ({} hosts)".format(host_count))
        imdb.evaluate_detections(all_boxes, all_cnr, output_dir)
    return all_boxes, all_cnr
