#!/usr/bin/env python
"""Real-hardware kernel validation: runs every Pallas kernel on the TPU
and checks it against its oracle (the pytest suite runs on virtual CPU
devices, where interpret mode cannot catch Mosaic lowering or precision
bugs — e.g. the f32-dot bf16-rounding corruption the BEV kernel hit).

Checks:
  1. BEV rasterization (sort + placement kernel) vs the numpy twin —
     bit-exact up to the documented excess-precision division deviation.
  2. ROI-pool Pallas forward vs the CUDA-semantics numpy oracle —
     bit-exact.
  3. ROI-pool Pallas backward (custom_vjp) vs the XLA autodiff
     backward — exact on distinct-valued features.
  4. Fused VGG stem kernel vs the XLA conv path — bf16 one-ulp.

Usage: python tools/tpu_selfcheck.py   (exit 0 = all pass)
       python tools/tpu_selfcheck.py --write-golden   (record check-6 ref)
"""

import os
import sys

import _init_paths  # noqa: F401
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_tpu_fullshape.npz")


def main():
    import jax
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this validates interpret/XLA "
              "paths, not Mosaic lowering", flush=True)
    failures = []

    def check(name, ok, detail=""):
        print("  [{}] {} {}".format("ok" if ok else "FAIL", name, detail),
              flush=True)
        if not ok:
            failures.append(name)

    rng = np.random.RandomState(11)

    # --- 1. BEV rasterization ------------------------------------------------
    from mv3d_tf_tpu.ops import bev as bev_ops
    B, N = 8, 131072
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.rand(B, N) * 80 - 10
    pts[..., 1] = rng.rand(B, N) * 80 - 40
    pts[..., 2] = rng.rand(B, N) * 4 - 3
    pts[..., 3] = rng.rand(B, N)
    val = np.ones((B, N), bool)
    fast = np.asarray(bev_ops.point_cloud_2_top_batch(
        jax.device_put(pts), jax.device_put(val)))
    host = np.stack([bev_ops.point_cloud_2_top_np(pts[b]) for b in range(B)])
    mism = int((fast != host).sum())
    # documented deviation: ~1 in 1e5 points on exact cell boundaries
    check("bev bit-parity vs numpy twin", mism <= 64,
          "({} of {} cells differ)".format(mism, host.size))

    # --- 2. ROI-pool forward -------------------------------------------------
    from mv3d_tf_tpu.ops.roi_pool import (_make_roi_pool_cvjp, roi_pool,
                                          roi_pool_fast, roi_pool_np)
    feat = rng.rand(75, 75, 512).astype(np.float32)
    R = 60
    x1 = rng.rand(R) * 540
    y1 = rng.rand(R) * 540
    rois = np.stack([np.zeros(R), x1, y1,
                     x1 + rng.rand(R) * 58 + 2,
                     y1 + rng.rand(R) * 58 + 2], 1).astype(np.float32)
    # include right/bottom-edge rois (the r1 alignment bug regression)
    rois[0] = [0, 592, 592, 599, 599]
    rois[1] = [0, 0, 0, 599, 599]
    got = np.asarray(roi_pool_fast(
        jax.device_put(jnp.asarray(feat, jnp.float32)),
        jax.device_put(rois), rois_per_step=12)).astype(np.float32)
    ref = roi_pool_np(feat, rois)
    check("roi-pool fwd vs CUDA-semantics oracle",
          np.array_equal(got, ref),
          "(max diff {:.2e})".format(np.abs(got - ref).max()))

    # --- 3. ROI-pool backward ------------------------------------------------
    H, W, C = 75, 75, 512
    featd = jnp.asarray(
        rng.permutation(H * W * C).reshape(H, W, C).astype(np.float32))
    dy = jnp.asarray(rng.rand(R, 7, 7, C).astype(np.float32))
    roisd = jax.device_put(rois)
    cvjp = _make_roi_pool_cvjp(7, 1.0 / 8, None, None)

    g_pal = np.asarray(jax.grad(
        lambda f: jnp.sum(cvjp(f, roisd) * dy))(featd))
    g_xla = np.asarray(jax.grad(
        lambda f: jnp.sum(roi_pool(f, roisd) * dy))(featd))
    check("roi-pool bwd vs XLA autodiff",
          np.allclose(g_pal, g_xla, rtol=1e-6, atol=1e-6),
          "(max diff {:.2e})".format(np.abs(g_pal - g_xla).max()))

    # --- 4. fused VGG stem ---------------------------------------------------
    # WIDE shape (Wh >= 256): must be bf16-close. Narrow widths (W<=256,
    # half-width = one 128-lane tile) mis-lower on the current Mosaic
    # stack (rel ~0.42, bisected r2) — the kernel must REFUSE them so the
    # XLA fallback runs instead; both are guarded here.
    from mv3d_tf_tpu.models import vgg
    from mv3d_tf_tpu.ops.vgg_stem_pallas import vgg_stem_pallas
    x = rng.rand(2, 120, 601, 9).astype(np.float32)
    w1 = (rng.rand(3, 3, 9, 64).astype(np.float32) - 0.5) * 0.2
    b1 = rng.rand(64).astype(np.float32) * 0.1
    w2 = (rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.2
    b2 = rng.rand(64).astype(np.float32) * 0.1
    ref_s = np.asarray(vgg.max_pool_2x2_valid(vgg.conv2d(
        vgg.conv2d(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
                   dtype=jnp.bfloat16),
        jnp.asarray(w2), jnp.asarray(b2), dtype=jnp.bfloat16)),
        np.float32)
    got_s = np.asarray(vgg_stem_pallas(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), tile_rows=10), np.float32)
    rel = np.abs(ref_s - got_s).max() / max(np.abs(ref_s).max(), 1e-6)
    check("vgg stem vs XLA, wide (bf16-close)", rel <= 2 ** -7,
          "(rel {:.2e})".format(rel))
    try:
        vgg_stem_pallas(jnp.asarray(x[:, :, :200]), jnp.asarray(w1),
                        jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
                        tile_rows=10)
        narrow_refused = False
    except ValueError:
        narrow_refused = True
    check("vgg stem refuses narrow width (Mosaic bug guard)",
          narrow_refused)

    # --- 5. axon NMS construction rules (VERDICT r1 #6) ----------------------
    # Two documented failure modes on this platform (proposals.py:85-100,
    # ops/nms.py:90-97): (a) a data-dependent while_loop NMS after
    # lax.top_k in a SMALL standalone program hard-crashes the TPU
    # worker; (b) a second sort inside the big fused graph sends the
    # remote compiler into minutes-long schedules. The shipping rules:
    # fori greedy for small standalone programs, blocked-scan for large
    # fused graphs. This check executes BOTH shipping constructions on
    # the real chip so a refactor that silently swaps them fails loudly
    # here instead of wedging the worker in production.
    from mv3d_tf_tpu.proposals import proposal_layer_3d
    calib = np.zeros((4, 12), np.float32)
    calib[0] = [707.0, 0, 601.8, 45.7, 0, 707.0, 183.1, -0.34,
                0, 0, 1.0, 0.005]
    calib[2, :9] = np.eye(3, dtype=np.float32).reshape(-1)
    calib[3] = [0.0002, -0.9999, -0.0106, -0.002, 0.0104, 0.0106,
                -0.9999, -0.075, 0.9999, 0.0002, 0.0105, -0.272]
    prob = jax.device_put(rng.rand(1, 75, 75, 8).astype(np.float32))
    deltas = jax.device_put(
        (rng.rand(1, 75, 75, 24).astype(np.float32) - 0.5) * 0.1)
    calibd = jax.device_put(calib)
    try:
        # (a) small standalone program, fori NMS (test budget)
        small = proposal_layer_3d(prob, deltas, calibd, 75, 75,
                                  pre_nms_top_n=6000, post_nms_top_n=300,
                                  nms_thresh=0.7)
        n_small = int(np.asarray(small["valid"]).sum())
        check("nms small standalone (fori) runs", n_small > 0,
              "({} valid)".format(n_small))
        # (b) blocked-scan NMS at the train budget inside one jit
        big = proposal_layer_3d(prob, deltas, calibd, 75, 75,
                                pre_nms_top_n=12000, post_nms_top_n=2000,
                                nms_thresh=0.7, nms_impl="blocked")
        n_big = int(np.asarray(big["valid"]).sum())
        check("nms blocked-scan (train budget) runs", n_big > 0,
              "({} valid)".format(n_big))
        # keep sets must agree on the shared prefix when budgets allow
        ka = np.asarray(small["rois_bv"])[:50]
        kb = np.asarray(big["rois_bv"])[:50]
        check("nms fori/blocked keep sets agree", np.allclose(ka, kb,
                                                              atol=1e-4))
        # (c) fixed-trip blocked scan (r4 fault-safe fast path): must
        # certify convergence on-chip AND match the fori keep set
        fx = proposal_layer_3d(prob, deltas, calibd, 75, 75,
                               pre_nms_top_n=6000, post_nms_top_n=300,
                               nms_thresh=0.7, nms_impl="blocked_fixed")
        check("nms blocked_fixed certifies + matches fori",
              bool(np.asarray(fx["nms_converged"]))
              and np.allclose(np.asarray(fx["rois_bv"]),
                              np.asarray(small["rois_bv"]), atol=1e-4))
    except Exception as e:  # noqa: BLE001 — any crash here is the finding
        check("nms construction rules", False, repr(e)[:200])

    # --- 6. full-shape TPU golden (VERDICT r1 #8) ----------------------------
    # The 81x81 CPU canary (tests/test_golden_e2e.py) cannot see bf16
    # excess-precision or Mosaic lowering drift — this pins the REAL
    # 601^2 + 384x1248 bf16 single-frame detect output on the chip.
    # Tolerances are banded: scores are softmax outputs (atol 2e-2 vs
    # recorded bf16 values), box coords in BEV pixels (atol 1.0), and the
    # valid count must match exactly.
    from mv3d_tf_tpu.eval import build_detect_fn
    from mv3d_tf_tpu.models import mv3d as mv3d_model
    grng = np.random.RandomState(7)
    params_g = jax.device_put(mv3d_model.init_params(jax.random.PRNGKey(0)))
    bev_g = jax.device_put(grng.rand(601, 601, 9).astype(np.float32))
    img_g = jax.device_put(
        (grng.rand(384, 1248, 3) * 255).astype(np.float32))
    detect_g = build_detect_fn(compute_dtype=jnp.bfloat16)
    out_g = detect_g(params_g, bev_g, img_g, jax.device_put(calib))
    got_scores = np.asarray(out_g["scores"], np.float32)
    got_bv = np.asarray(out_g["boxes_bv"], np.float32)
    got_valid = np.asarray(out_g["valid"])
    if "--write-golden" in sys.argv:
        np.savez_compressed(GOLDEN_PATH, scores=got_scores, boxes_bv=got_bv,
                            valid=got_valid)
        print("  [wrote] full-shape golden -> " + GOLDEN_PATH, flush=True)
    elif os.path.exists(GOLDEN_PATH) and dev.platform != "cpu":
        ref_g = np.load(GOLDEN_PATH)
        ok = (int(got_valid.sum()) == int(ref_g["valid"].sum())
              and np.allclose(got_scores, ref_g["scores"], atol=2e-2)
              and np.allclose(got_bv, ref_g["boxes_bv"], atol=1.0))
        check("full-shape TPU golden", ok,
              "(valid {} vs {}, max dscore {:.3e}, max dbox {:.2f})".format(
                  int(got_valid.sum()), int(ref_g["valid"].sum()),
                  np.abs(got_scores - ref_g["scores"]).max(),
                  np.abs(got_bv - ref_g["boxes_bv"]).max()))
    else:
        print("  [skip] full-shape golden (no artifact or CPU run)",
              flush=True)

    # --- 7. int8 Pallas conv kernels (r2) -------------------------------------
    # v2 3x3 (flattened rows + 3C contraction) and 2x2 VALID (packed
    # stem) vs the XLA _conv_requant math — s32 accumulation is exact,
    # so real-TPU outputs must be bit-identical to the XLA s8 path.
    from mv3d_tf_tpu import quant as Q
    from mv3d_tf_tpu.ops.conv_s8_pallas import (conv2x2_s8_pallas,
                                                conv3x3_s8_pallas_v2)
    x8 = rng.randint(0, 128, (2, 75, 75, 256)).astype(np.int8)
    w8 = rng.randint(-127, 128, (3, 3, 256, 256)).astype(np.int8)
    kq = (rng.rand(256) * 2e-3 + 1e-4).astype(np.float32)
    bq = (rng.rand(256) - 0.5).astype(np.float32)
    y32 = Q._conv_s8(jnp.asarray(x8), jnp.asarray(w8))
    ref_q = np.asarray(jnp.clip(jnp.round(
        y32.astype(jnp.float32) * kq + bq), 0, 127).astype(jnp.int8))
    got_q = np.asarray(conv3x3_s8_pallas_v2(
        jax.device_put(x8), jax.device_put(w8), jax.device_put(kq),
        jax.device_put(bq), tile_rows=5))
    check("s8 conv3x3 v2 vs XLA s8 (bit-exact)",
          np.array_equal(got_q, ref_q),
          "(max |diff| {})".format(
              np.abs(got_q.astype(np.int32)
                     - ref_q.astype(np.int32)).max()))

    x2 = rng.randint(0, 128, (2, 151, 157, 256)).astype(np.int8)
    w2q = rng.randint(-127, 128, (2, 2, 256, 256)).astype(np.int8)
    y32 = jax.lax.conv_general_dilated(
        jnp.asarray(x2), jnp.asarray(w2q), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    ref2 = np.asarray(jnp.clip(jnp.round(
        y32.astype(jnp.float32) * kq + bq), 0, 127).astype(jnp.int8))
    got2 = np.asarray(conv2x2_s8_pallas(
        jax.device_put(x2), jax.device_put(w2q), jax.device_put(kq),
        jax.device_put(bq), tile_rows=10))
    check("s8 conv2x2 (packed stem) vs XLA s8 (bit-exact)",
          np.array_equal(got2, ref2),
          "(max |diff| {})".format(
              np.abs(got2.astype(np.int32)
                     - ref2.astype(np.int32)).max()))

    # --- 8. space-to-depth stem vs literal (bf16-close) -----------------------
    from mv3d_tf_tpu.ops.stem_s2d import stem_s2d
    xs2 = jnp.asarray(rng.rand(1, 121, 601, 9).astype(np.float32))
    ref_t = np.asarray(vgg.max_pool_2x2_valid(vgg.conv2d(
        vgg.conv2d(xs2, jnp.asarray(w1), jnp.asarray(b1),
                   dtype=jnp.bfloat16),
        jnp.asarray(w2), jnp.asarray(b2), dtype=jnp.bfloat16)),
        np.float32)
    got_t = np.asarray(stem_s2d(xs2, jnp.asarray(w1), jnp.asarray(b1),
                                jnp.asarray(w2), jnp.asarray(b2),
                                dtype=jnp.bfloat16), np.float32)
    rel = np.abs(ref_t - got_t).max() / max(np.abs(ref_t).max(), 1e-6)
    check("s2d stem vs literal (bf16-close)", rel <= 2 ** -6,
          "(rel {:.2e})".format(rel))

    # --- 8b. FUSED s2d stem kernel vs the XLA s2d stem (r3) -------------------
    # Same math, single Pallas pass (ops/stem_s2d_pallas.py) — must track
    # the XLA s2d output within bf16 partial-sum noise on real Mosaic.
    from mv3d_tf_tpu.ops.stem_s2d_pallas import stem_s2d_fused
    got_f = np.asarray(stem_s2d_fused(xs2, jnp.asarray(w1),
                                      jnp.asarray(b1), jnp.asarray(w2),
                                      jnp.asarray(b2),
                                      dtype=jnp.bfloat16), np.float32)
    rel_f = np.abs(got_t - got_f).max() / max(np.abs(got_t).max(), 1e-6)
    check("s2d stem FUSED vs XLA s2d (bf16-close)", rel_f <= 2 ** -6,
          "(rel {:.2e})".format(rel_f))

    # --- 9. ROI pool on int8 feature maps (r2) --------------------------------
    # The quantized detector pools s8 features directly; Mosaic has no
    # int8 reduction lowering, so the kernel reduces in int32 — this
    # check guards both the lowering (compiles at all) and the math.
    from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
    feat8 = rng.randint(0, 128, (1, 75, 75, 512)).astype(np.int8)
    got8 = np.asarray(roi_pool_pallas(
        jax.device_put(jnp.asarray(feat8)), jax.device_put(rois),
        rois_per_step=12)).astype(np.float32)
    ref8 = roi_pool_np(feat8[0].astype(np.float32), rois)
    check("roi-pool fwd on int8 features (Mosaic s8-reduce guard)",
          np.array_equal(got8, ref8),
          "(max diff {:.2e})".format(np.abs(got8 - ref8).max()))

    print(("ALL OK" if not failures else
           "FAILURES: " + ", ".join(failures)), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
