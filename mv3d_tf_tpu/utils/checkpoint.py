"""Checkpointing with orbax — replaces tf.train.Saver snapshots
(train_mv.py:49-65,214-219) and additionally persists optimizer state
(the reference restarts Adam from scratch on every run).

Snapshot naming keeps the reference scheme:
  <SNAPSHOT_PREFIX>[_<INFIX>]_iter_<N>  under the output dir.
"""

import os
import os.path as osp

import numpy as np
import orbax.checkpoint as ocp

from mv3d_tf_tpu.config import cfg


def snapshot_name(iter_n, prefix=None, infix=None):
    prefix = cfg.TRAIN.SNAPSHOT_PREFIX if prefix is None else prefix
    infix = cfg.TRAIN.SNAPSHOT_INFIX if infix is None else infix
    mid = ("_" + infix) if infix else ""
    return "{}{}_iter_{:d}".format(prefix, mid, iter_n)


def save_checkpoint(output_dir, iter_n, params, opt_state=None):
    path = osp.abspath(osp.join(output_dir, snapshot_name(iter_n)))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    print("Wrote snapshot to: {:s}".format(path))
    return path


def load_checkpoint(path, params_like, opt_state_like=None):
    """Restore a snapshot into pytrees shaped like the given templates.

    Loading params-only from a params+opt_state snapshot is supported
    (non-strict restore) — the reference's test path similarly loads
    weights without optimizer state.

    Snapshots record the device sharding they were saved with; a snapshot
    written on the TPU is still loadable on a CPU-only host (offline
    analysis, eval on another machine) via the host-restore fallback.
    """
    ckptr = ocp.StandardCheckpointer()
    path = osp.abspath(path)
    try:
        template = {"params": params_like}
        if opt_state_like is not None:
            template["opt_state"] = opt_state_like
            restored = ckptr.restore(path, template)
            return restored["params"], restored["opt_state"]
        # no template: restore the full saved tree (params [+ opt_state])
        # and keep params — sidesteps orbax's structure-match requirement
        restored = ckptr.restore(path)
        return restored["params"]
    except ValueError as e:
        if "was not found in jax.local_devices" not in str(e):
            raise
        restored = load_checkpoint_host(path)
        if opt_state_like is not None:
            import jax
            opt = jax.tree.unflatten(
                jax.tree.structure(opt_state_like),
                jax.tree.leaves(restored["opt_state"]))
            return restored["params"], opt
        return restored["params"]


def load_checkpoint_host(path):
    """Restore a snapshot's full tree as HOST numpy arrays, ignoring the
    saved device shardings (e.g. a TPU-written snapshot on a CPU host)."""
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(osp.abspath(path)).item_metadata.tree
    import jax
    return ckptr.restore(osp.abspath(path), restore_args=jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree))


def latest_snapshot(output_dir):
    """Highest-iteration snapshot dir, or None."""
    if not osp.isdir(output_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(output_dir):
        if "_iter_" in name and osp.isdir(osp.join(output_dir, name)):
            try:
                it = int(name.rsplit("_iter_", 1)[1])
            except ValueError:
                continue
            if it > best_iter:
                best, best_iter = osp.join(output_dir, name), it
    return best


def load_pretrained(params, path):
    """Load either a reference-style .npy dict or an orbax snapshot."""
    from mv3d_tf_tpu.utils.weights import load_npy_weights
    if path.endswith(".npy"):
        return load_npy_weights(params, path, ignore_missing=True)
    return load_checkpoint(path, params)
