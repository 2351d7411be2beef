#!/usr/bin/env python
"""Minimal-repro bisection for the int8-trunk + s8-Pallas-pool fused
graph TPU worker fault (VERDICT r3 #1: root-cause, then land a stable
int8 config).

Known from probes (experiments/results/r4/probe_*.log):
  * s8 Pallas pool alone: OK;
  * int8 conv trunks + bf16 pool: OK;
  * int8 trunks + s8 pool in ONE jit: kernel fault (either stem).
Each --case is one candidate graph; run cases as separate subprocess
invocations so a fault doesn't take the probe series down.
"""
import argparse
import sys

import _init_paths  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True,
                    choices=["conv1_pool", "conv2_pool", "chain_pool",
                             "requant_pool", "barrier_pool",
                             "copy_pool", "chain_pool_b1",
                             "chain_pool_rt1", "chain_pool_img",
                             "maxpool_chain", "twoview",
                             "proposal_pool", "trunk_pool",
                             "nan_rois", "nan_rois_bf16",
                             "proposal_pool_bf16",
                             "proposal_only", "proposal_pool_barrier",
                             "proposal_pool_sbarrier",
                             "proposal_pool_fori",
                             "proposal_pool_fori_bf16"])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mv3d_tf_tpu.ops.roi_pool import roi_pool_fast

    print("device:", jax.devices()[0], "case:", args.case,
          file=sys.stderr, flush=True)
    B, P = args.batch, 300
    H = W = 75
    C = 512
    rng = np.random.RandomState(0)

    x_q = jax.device_put(
        rng.randint(0, 128, size=(B, H, W, C)).astype(np.int8))
    w_q = jax.device_put(
        rng.randint(-127, 128, size=(3, 3, C, C)).astype(np.int8))
    k = jax.device_put(np.full((C,), 1e-4, np.float32))
    b = jax.device_put(np.zeros((C,), np.float32))

    x1 = rng.rand(B * P) * W * 8
    y1 = rng.rand(B * P) * H * 8
    rois = np.stack([np.repeat(np.arange(B, dtype=np.float32), P),
                     x1, y1, x1 + rng.rand(B * P) * 60,
                     y2 := y1 + rng.rand(B * P) * 60], axis=1)
    del y2
    rois = jax.device_put(rois.astype(np.float32))

    def conv_requant(x, n=1):
        from mv3d_tf_tpu.quant import _conv_s8
        for _ in range(n):
            y32 = _conv_s8(x, w_q)
            y = y32.astype(jnp.float32) * k + b
            x = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
        return x

    rt = 12
    case = args.case

    if case in ("maxpool_chain", "twoview", "proposal_pool",
                "trunk_pool", "nan_rois", "nan_rois_bf16",
                "proposal_pool_bf16", "proposal_only",
                "proposal_pool_barrier", "proposal_pool_sbarrier",
                "proposal_pool_fori", "proposal_pool_fori_bf16"):
        _run_escalated(case, args, jax, jnp, np, roi_pool_fast,
                       x_q, w_q, k, b, rois, rt)
        return

    @jax.jit
    def run(x, r):
        if case == "conv1_pool":        # one s8 conv -> s8 pool
            f = conv_requant(x, 1)
        elif case == "conv2_pool":      # two s8 convs -> s8 pool
            f = conv_requant(x, 2)
        elif case in ("chain_pool", "chain_pool_b1", "chain_pool_rt1",
                      "chain_pool_img"):
            f = conv_requant(x, 4)      # 4-conv chain (conv5-like load)
        elif case == "requant_pool":    # no conv: requant epilogue only
            y = x.astype(jnp.float32) * k + b
            f = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
        elif case == "barrier_pool":    # chain + optimization_barrier
            f = conv_requant(x, 4)
            f = jax.lax.optimization_barrier(f)
        elif case == "copy_pool":       # chain + explicit copy
            f = conv_requant(x, 4)
            f = jax.lax.with_sharding_constraint(
                f, jax.sharding.SingleDeviceSharding(jax.devices()[0])
            ) if False else f + jnp.int8(0)
        step = 1 if case == "chain_pool_rt1" else rt
        return roi_pool_fast(f, r, spatial_scale=1.0 / 8,
                             rois_per_step=step)

    xx, rr_ = x_q, rois
    if case == "chain_pool_b1":
        xx, rr_ = x_q[:1], rois[:P]
    out = run(xx, rr_)
    s = float(np.asarray(jax.device_get(
        out.astype(jnp.float32).ravel()[0])))
    print("CASE", case, "OK sum0=", s)


def _run_escalated(case, args, jax, jnp, np, roi_pool_fast,
                   x_q, w_q, k, b, rois, rt):
    """Cases that add the remaining real-graph ingredients one at a
    time: int8 2x2 max pools, the second (image) view, the proposal
    layer as the roi source, and the full int8 trunk."""
    from mv3d_tf_tpu.quant import _conv_s8
    from mv3d_tf_tpu.models import vgg

    B, P = args.batch, 300
    rng = np.random.RandomState(1)

    def conv_requant(x, w, n=1):
        for _ in range(n):
            y32 = _conv_s8(x, w)
            y = y32.astype(jnp.float32) * k[:w.shape[3]] + b[:w.shape[3]]
            x = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
        return x

    if case in ("nan_rois", "nan_rois_bf16"):
        # standalone pool fed ADVERSARIAL rois (NaN / Inf / negative /
        # huge) — proposal outputs on random weights can contain any of
        # these; bin bounds are clip()ed but the float->int cast of
        # NaN/Inf is implementation-defined
        bad = np.asarray(jax.device_get(rois)).copy()
        bad[0, 1:] = np.nan
        bad[1, 1:] = np.inf
        bad[2, 1:] = -np.inf
        bad[3, 1:] = -1e30
        bad[4, 1:] = 1e30
        bad[5, 1:] = [5e8, -5e8, 5e8, -5e8]
        bad_d = jax.device_put(bad.astype(np.float32))
        f0 = (x_q if case == "nan_rois"
              else x_q.astype(jnp.bfloat16))

        @jax.jit
        def run(x, r):
            return roi_pool_fast(x, r, spatial_scale=1.0 / 8,
                                 rois_per_step=rt)
        out = run(f0, bad_d)
    elif case in ("proposal_pool_bf16", "proposal_only",
                  "proposal_pool_barrier", "proposal_pool_sbarrier",
                  "proposal_pool_fori", "proposal_pool_fori_bf16"):
        # control: the SAME proposal->pool coupling with a bf16 feature
        # map (the shipping bf16 graph's combination), and
        # proposal-only (no pool)
        from mv3d_tf_tpu.proposals import proposal_layer_3d
        prob = jax.device_put(
            rng.rand(B, 75, 75, 8).astype(np.float32))
        boxd = jax.device_put(
            ((rng.rand(B, 75, 75, 24) - 0.5) * 0.1).astype(np.float32))
        calib = np.zeros((B, 4, 12), np.float32)
        calib[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                       0, 0, 1.0, 0.005]
        calib[:, 2, :9] = np.eye(3).reshape(-1)
        calib[:, 3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                       -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
        calib = jax.device_put(calib)
        pool_dt = (jnp.int8 if case in ("proposal_pool_barrier",
                                        "proposal_pool_sbarrier",
                                        "proposal_pool_fori")
                   else jnp.bfloat16)
        nms_impl = ("auto" if case.startswith("proposal_pool_fori")
                    else "blocked")
        if case == "proposal_pool_sbarrier":
            import mv3d_tf_tpu.ops.roi_pool_pallas as RPP
            RPP._SCALAR_BARRIER = True

        @jax.jit
        def run(x, pr, bx, cal):
            f = conv_requant(x, w_q, 2).astype(pool_dt)
            rois_d = jax.vmap(
                lambda p, d, c: proposal_layer_3d(
                    p[None], d[None], c, 75, 75, pre_nms_top_n=6000,
                    post_nms_top_n=P, nms_thresh=0.7,
                    nms_impl=nms_impl))(pr, bx, cal)
            fi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
            fbv = rois_d["rois_bv"].reshape(B * P, 5).at[:, 0:1].set(fi)
            if case == "proposal_only":
                return fbv
            if case == "proposal_pool_barrier":
                fbv = jax.lax.optimization_barrier(fbv)
            return roi_pool_fast(f, fbv, spatial_scale=1.0 / 8,
                                 rois_per_step=rt)
        out = run(x_q, prob, boxd, calib)
    elif case == "maxpool_chain":
        # conv -> int8 2x2 maxpool -> conv -> s8 pool (the s8
        # reduce_window is the untested ingredient)
        x300 = jax.device_put(
            rng.randint(0, 128, size=(B, 150, 150, 512)).astype(np.int8))

        @jax.jit
        def run(x, r):
            f = conv_requant(x, w_q, 1)
            f = vgg.max_pool_2x2_valid(f)
            f = conv_requant(f, w_q, 1)
            return roi_pool_fast(f, r, spatial_scale=1.0 / 8,
                                 rois_per_step=rt)
        out = run(x300, rois)
    elif case == "twoview":
        # both views' chains + pools in ONE program
        ximg = jax.device_put(
            rng.randint(0, 128, size=(B, 48, 156, 512)).astype(np.int8))
        from mv3d_tf_tpu.proposals import IMG_BOUNDS, IMG_PAD
        mih = int(IMG_BOUNDS[0] + 2 * IMG_PAD + 10)
        miw = int(IMG_BOUNDS[1] + 2 * IMG_PAD + 10)
        x1 = rng.rand(B * P) * 156 * 8
        y1 = rng.rand(B * P) * 48 * 8
        rois_img = jax.device_put(np.stack(
            [np.repeat(np.arange(B, dtype=np.float32), P),
             x1, y1, x1 + rng.rand(B * P) * 200,
             y1 + rng.rand(B * P) * 150], axis=1).astype(np.float32))

        @jax.jit
        def run(x, xi, r, ri):
            f = conv_requant(x, w_q, 2)
            fi = conv_requant(xi, w_q, 2)
            p1 = roi_pool_fast(f, r, spatial_scale=1.0 / 8,
                               rois_per_step=rt)
            p2 = roi_pool_fast(fi, ri, spatial_scale=1.0 / 8,
                               max_in_h=mih, max_in_w=miw,
                               rois_per_step=rt)
            return p1.astype(jnp.float32).sum() + p2.astype(
                jnp.float32).sum()
        out = run(x_q, ximg, rois, rois_img)
    elif case == "proposal_pool":
        # rois from the REAL proposal layer (random RPN outputs), pool
        # from an s8 conv chain — exercises proposal+pool coupling
        from mv3d_tf_tpu.proposals import proposal_layer_3d
        prob = jax.device_put(
            rng.rand(B, 75, 75, 8).astype(np.float32))
        boxd = jax.device_put(
            ((rng.rand(B, 75, 75, 24) - 0.5) * 0.1).astype(np.float32))
        calib = np.zeros((B, 4, 12), np.float32)
        calib[:, 0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                       0, 0, 1.0, 0.005]
        calib[:, 2, :9] = np.eye(3).reshape(-1)
        calib[:, 3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                       -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
        calib = jax.device_put(calib)

        @jax.jit
        def run(x, pr, bx, cal):
            f = conv_requant(x, w_q, 2)
            rois_d = jax.vmap(
                lambda p, d, c: proposal_layer_3d(
                    p[None], d[None], c, 75, 75, pre_nms_top_n=6000,
                    post_nms_top_n=P, nms_thresh=0.7,
                    nms_impl="blocked"))(pr, bx, cal)
            fi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)[:, None]
            fbv = rois_d["rois_bv"].reshape(B * P, 5).at[:, 0:1].set(fi)
            return roi_pool_fast(f, fbv, spatial_scale=1.0 / 8,
                                 rois_per_step=rt)
        out = run(x_q, prob, boxd, calib)
    elif case == "trunk_pool":
        # the REAL int8 trunk (bf16 stem -> 11 s8 convs + int8 pools)
        # feeding the s8 pool — everything but proposals/head
        from mv3d_tf_tpu import quant as Q
        from mv3d_tf_tpu.models import mv3d
        params = jax.device_put(mv3d.init_params(jax.random.PRNGKey(0)))
        bev = jax.device_put(rng.rand(B, 601, 601, 9).astype(np.float32))
        qs = Q.build_quant_state(params, np.asarray(bev)[:2],
                                 rng.rand(2, 384, 1248, 3).astype(
                                     np.float32))
        qbv = jax.device_put(qs["trunk_bv"])

        @jax.jit
        def run(x, r):
            stem = Q._bf16_stem(params, x, suffix="")
            f, s = Q.trunk_apply_int8_from_stem(qbv, stem)
            return roi_pool_fast(f, r, spatial_scale=1.0 / 8,
                                 rois_per_step=rt)
        out = run(bev, rois)
    s = float(np.asarray(jax.device_get(
        jnp.asarray(out).astype(jnp.float32).ravel()[0])))
    print("CASE", case, "OK sum0=", s)


if __name__ == "__main__":
    main()

