"""Multi-chip scaling via jax.sharding — a NEW capability surface (the
reference has no multi-device or multi-process parallelism of any kind;
SURVEY §2.8).

Design (the TPU-native answer to the reference's frame-at-a-time loop):
  * one 1-D `data` mesh over the chips (KITTI frames are the natural
    parallel unit — the reference's eval loop test_mv.py:394 is
    embarrassingly frame-parallel);
  * parameters replicated, the frame batch sharded on axis 0;
  * the per-frame loss (train.build_forward_losses) is vmapped over the
    local shard and jit inserts the gradient all-reduce over ICI — no
    explicit collectives, XLA lays them out;
  * eval: the single-frame detector vmapped + sharded the same way.

Multi-host eval sweeps shard frames per host over DCN at the data-loader
level (each host feeds its own shard); nothing NCCL-like exists or needs
to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mv3d_tf_tpu.train import build_forward_losses


def make_mesh(devices=None, axis="data"):
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh, batch, axis="data"):
    """Place a stacked frame batch (leading dim B) sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def build_parallel_train_step(mesh, lr=1e-5, optimizer=None, axis="data",
                              **forward_kwargs):
    """Data-parallel train step over a frame batch.

    Returns (train_step, tx): train_step(params, opt_state, batch, keys)
    where every batch leaf has a leading frame dim B divisible by the mesh
    size and keys is (B, 2) uint32 per-frame PRNG keys. Gradients are
    averaged over frames; XLA inserts the ICI all-reduce from the
    shardings.
    """
    tx = optimizer if optimizer is not None else optax.adam(lr)
    # fresh dict (no caller-visible mutation): vmap-safe XLA pool default
    forward_kwargs = {"pool_impl": "xla", **forward_kwargs}
    forward_losses = build_forward_losses(**forward_kwargs)

    batch_spec = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def loss_fn(params, batch, keys):
        metrics = jax.vmap(
            lambda b, k: forward_losses(params, b, k),
            in_axes=(0, 0))(batch, keys)
        mean = {k: jnp.mean(v) for k, v in metrics.items()}
        return mean["loss"], mean

    @jax.jit
    def train_step(params, opt_state, batch, keys):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_spec, batch))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params, batch, keys)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: rep, grads))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, tx


def build_spatial_detect(mesh, detect_single=None, axis="data", **kwargs):
    """SPATIALLY sharded single-frame inference: the 601^2 BEV and the
    image are split across chips along their ROW dim (SURVEY §2.8's
    optional spatial-sharding item — latency mode, one frame across the
    whole slice, vs build_parallel_detect's frame-parallel throughput
    mode).

    Implementation is pure sharding annotations: XLA's SPMD partitioner
    spatially partitions the SAME-padded convolutions and inserts the
    halo exchanges (collective-permutes over ICI) itself — the
    scaling-book recipe of "annotate, let XLA insert collectives". The
    small post-trunk tensors (75^2 features, proposals, pooled ROIs)
    get all-gathered where propagation demands.

    detect(params, bev (H,W,9), image (Hi,Wi,3), calib (4,12)) ->
    single-frame detection dict (replicated).
    """
    if detect_single is None:
        from mv3d_tf_tpu.eval import build_detect_fn
        detect_single = build_detect_fn(**kwargs)
    row_spec = NamedSharding(mesh, P(axis))      # shard dim 0 = rows
    rep = NamedSharding(mesh, P())

    @jax.jit
    def detect(params, bev, image, calib):
        bev = jax.lax.with_sharding_constraint(bev, row_spec)
        image = jax.lax.with_sharding_constraint(image, row_spec)
        out = detect_single(params, bev, image, calib)
        return jax.tree.map(
            lambda t: jax.lax.with_sharding_constraint(t, rep), out)

    return detect


def build_parallel_detect(mesh, detect_single=None, axis="data", **kwargs):
    """Batched, mesh-sharded inference: (params, bev(B,...), image(B,...),
    calib(B,4,12)) -> stacked detection dict."""
    if detect_single is None:
        from mv3d_tf_tpu.eval import build_detect_fn
        detect_single = build_detect_fn(**kwargs)
    batch_spec = NamedSharding(mesh, P(axis))

    @jax.jit
    def detect_batch(params, bev, image, calib):
        bev = jax.lax.with_sharding_constraint(bev, batch_spec)
        image = jax.lax.with_sharding_constraint(image, batch_spec)
        calib = jax.lax.with_sharding_constraint(calib, batch_spec)
        return jax.vmap(lambda b, i, c: detect_single(params, b, i, c))(
            bev, image, calib)

    return detect_batch
