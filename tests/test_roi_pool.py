"""ROI pooling vs the CUDA-loop numpy oracle, plus gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tf_tpu.ops.roi_pool import roi_pool, roi_pool_np


def _rand_rois(rng, n, in_h, in_w, allow_outside=False):
    pad = 50 if allow_outside else 0
    x1 = rng.uniform(-pad, in_w - 10 + pad, n)
    y1 = rng.uniform(-pad, in_h - 10 + pad, n)
    x2 = x1 + rng.uniform(5, in_w / 2, n)
    y2 = y1 + rng.uniform(5, in_h / 2, n)
    if not allow_outside:
        x2 = np.minimum(x2, in_w - 1)
        y2 = np.minimum(y2, in_h - 1)
    z = np.zeros(n)
    return np.stack([z, x1, y1, x2, y2], 1).astype(np.float32)


def test_matches_cuda_oracle_small(rng):
    feat = rng.randn(20, 24, 8).astype(np.float32)
    rois = _rand_rois(rng, 40, 160, 192)
    got = np.asarray(roi_pool(feat, rois, pooled=7, spatial_scale=1 / 8))
    exp = roi_pool_np(feat, rois, pooled=7, spatial_scale=1 / 8)
    np.testing.assert_array_equal(got, exp)


def test_matches_oracle_whole_map_roi(rng):
    feat = rng.randn(75, 75, 4).astype(np.float32)
    rois = np.array([[0, 0, 0, 600, 600],        # whole BEV map
                     [0, 0, 0, 4, 4],            # tiny -> 1x1 forced
                     [0, 300, 300, 300, 300]],   # degenerate point
                    np.float32)
    got = np.asarray(roi_pool(feat, rois))
    exp = roi_pool_np(feat, rois)
    np.testing.assert_array_equal(got, exp)


def test_matches_oracle_outside_image(rng):
    # image-view rois can run past the frame ([-50, 1292] bounds); pass the
    # true extent bound so the static bin span covers them
    feat = rng.randn(48, 156, 6).astype(np.float32)
    rois = _rand_rois(rng, 30, 425, 1292, allow_outside=True)
    got = np.asarray(roi_pool(feat, rois, max_in_h=480, max_in_w=1350))
    exp = roi_pool_np(feat, rois)
    np.testing.assert_array_equal(got, exp)


def test_empty_bin_zero():
    feat = -np.ones((16, 16, 2), np.float32)     # all negative features
    # a roi whose bins land outside after clipping: start beyond extent
    rois = np.array([[0, 1000, 1000, 1200, 1200]], np.float32)
    out = np.asarray(roi_pool(feat, rois, spatial_scale=1 / 8,
                              max_in_h=1300, max_in_w=1300))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_gradient_routes_to_max(rng):
    feat = rng.randn(16, 16, 3).astype(np.float32)
    rois = np.array([[0, 0, 0, 120, 120]], np.float32)

    def loss(f):
        return jnp.sum(roi_pool(f, jnp.asarray(rois), spatial_scale=1 / 8))

    g = np.asarray(jax.grad(loss)(jnp.asarray(feat)))
    # gradient mass equals number of non-empty bins x channels
    out = roi_pool_np(feat, rois, spatial_scale=1 / 8)
    assert g.sum() == np.isfinite(out).all() * 7 * 7 * 3
    # gradient lands only on max locations: positions with g>0 must hold
    # the bin max value
    nz = np.argwhere(g > 0)
    assert len(nz) > 0
    for h, w, c in nz[:20]:
        assert feat[h, w, c] in out[0, :, :, c]


def test_vmap_over_frames(rng):
    feats = rng.randn(2, 20, 20, 4).astype(np.float32)
    rois = np.stack([_rand_rois(rng, 8, 150, 150) for _ in range(2)])
    out = jax.vmap(lambda f, r: roi_pool(f, r))(feats, rois)
    assert out.shape == (2, 8, 7, 7, 4)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out[b]),
                                      roi_pool_np(feats[b], rois[b]))


def test_pallas_kernel_matches_oracle_interpret(rng):
    """The Pallas fast path (interpret mode on CPU) is bit-exact vs the
    CUDA-loop oracle, including batched feature maps."""
    from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
    feat = rng.randn(20, 24, 8).astype(np.float32)
    rois = _rand_rois(rng, 10, 160, 192)
    got = np.asarray(roi_pool_pallas(feat, rois, spatial_scale=1 / 8,
                                     interpret=True))
    exp = roi_pool_np(feat, rois, spatial_scale=1 / 8)
    np.testing.assert_array_equal(got, exp)
    # batched: rois spread over 2 frames via the batch-idx column
    feats = rng.randn(2, 20, 24, 8).astype(np.float32)
    rois2 = _rand_rois(rng, 10, 160, 192)
    rois2[5:, 0] = 1.0
    got2 = np.asarray(roi_pool_pallas(feats, rois2, spatial_scale=1 / 8,
                                      interpret=True))
    exp2 = np.concatenate([roi_pool_np(feats[0], rois2[:5],
                                       spatial_scale=1 / 8),
                           roi_pool_np(feats[1], rois2[5:],
                                       spatial_scale=1 / 8)])
    np.testing.assert_array_equal(got2, exp2)


def test_pallas_kernel_multi_roi_blocks_interpret(rng):
    """rois_per_step>1 (block of rois per grid step) is bit-identical to
    the one-roi-per-step kernel when blocks don't straddle frames."""
    from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
    feats = rng.randn(3, 20, 24, 8).astype(np.float32)
    P = 6  # rois per frame
    rois = _rand_rois(rng, 3 * P, 160, 192)
    for f in range(3):
        rois[f * P:(f + 1) * P, 0] = f
    base = np.asarray(roi_pool_pallas(feats, rois, spatial_scale=1 / 8,
                                      interpret=True))
    for rt in (2, 3, 6):
        got = np.asarray(roi_pool_pallas(feats, rois, spatial_scale=1 / 8,
                                         interpret=True, rois_per_step=rt))
        np.testing.assert_array_equal(got, base)
    # non-divisible rois_per_step falls back to 1 (still correct)
    got = np.asarray(roi_pool_pallas(feats, rois, spatial_scale=1 / 8,
                                     interpret=True, rois_per_step=7))
    np.testing.assert_array_equal(got, base)


def test_pallas_cwin8_matches_interpret(rng, monkeypatch):
    """_CWIN=8 (the narrow column-bin window bench_ab --pool-cwin A/Bs)
    is bit-identical to the default 16 — bins straddling an 8-boundary
    just take an extra masked segment."""
    from mv3d_tf_tpu.ops import roi_pool_pallas as rpp
    feats = rng.randn(2, 20, 24, 8).astype(np.float32)
    rois = _rand_rois(rng, 12, 160, 192)
    rois[6:, 0] = 1
    base = np.asarray(rpp.roi_pool_pallas(feats, rois, spatial_scale=1 / 8,
                                          interpret=True, rois_per_step=6))
    monkeypatch.setattr(rpp, "_CWIN", 8)
    got = np.asarray(
        rpp.roi_pool_pallas.__wrapped__(feats, rois, spatial_scale=1 / 8,
                                        pooled=7, max_in_h=None,
                                        max_in_w=None, interpret=True,
                                        rois_per_step=6))
    np.testing.assert_array_equal(got, base)


def test_pallas_shared_bins_matches_window_interpret(rng, monkeypatch):
    """The r5 shared-window bin stage (_SHARED_BINS, one aligned RWIN
    read feeding all 7 column bins) is bit-identical to the per-bin
    CWIN-window stage — including rois wider than RWIN=32 feature cells
    (multi-segment accumulation) and the oracle."""
    from mv3d_tf_tpu.ops import roi_pool_pallas as rpp
    feats = rng.randn(2, 12, 64, 8).astype(np.float32)
    rois = _rand_rois(rng, 8, 96, 512)
    # two rois spanning ~56 feature cells -> 2 RWIN segments
    rois[0] = [0, 8, 8, 460, 60]
    rois[4] = [1, 0, 0, 440, 88]
    rois[4:, 0] = 1
    shared = np.asarray(rpp.roi_pool_pallas(
        feats, rois, spatial_scale=1 / 8, interpret=True, rois_per_step=4))
    monkeypatch.setattr(rpp, "_SHARED_BINS", False)
    window = np.asarray(rpp.roi_pool_pallas.__wrapped__(
        feats, rois, spatial_scale=1 / 8, pooled=7, max_in_h=None,
        max_in_w=None, interpret=True, rois_per_step=4))
    np.testing.assert_array_equal(shared, window)
    oracle = np.concatenate([
        roi_pool_np(feats[0], rois[:4], spatial_scale=1 / 8),
        roi_pool_np(feats[1], rois[4:], spatial_scale=1 / 8)])
    np.testing.assert_array_equal(shared, oracle)


def test_roi_pool_chunked_matches(rng):
    feat = rng.randn(20, 24, 8).astype(np.float32)
    rois = _rand_rois(rng, 50, 160, 192)
    a = np.asarray(roi_pool(feat, rois, spatial_scale=1 / 8))
    b = np.asarray(roi_pool(feat, rois, spatial_scale=1 / 8, chunk=16))
    np.testing.assert_array_equal(a, b)


def test_pallas_smem_chunking_interpret(rng, monkeypatch):
    """The R > _R_MAX SMEM-chunked path (r4 batch-32 fix) is bit-exact,
    including a chunk boundary mid-frame and RT > _R_MAX (ADVICE r4:
    chunk must never be 0)."""
    from mv3d_tf_tpu.ops import roi_pool_pallas as RPP
    feats = rng.randn(2, 20, 24, 8).astype(np.float32)
    P = 12  # rois per frame; 24 total
    rois = _rand_rois(rng, 2 * P, 160, 192)
    for f in range(2):
        rois[f * P:(f + 1) * P, 0] = f
    base = np.asarray(RPP.roi_pool_pallas(feats, rois,
                                          spatial_scale=1 / 8,
                                          interpret=True))
    # force chunking: _R_MAX=9 with RT=3 -> chunk=9, boundaries at
    # 9/18 land MID-frame (frame 0 has 12 rois)
    monkeypatch.setattr(RPP, "_R_MAX", 9)
    got = np.asarray(RPP.roi_pool_pallas(feats, rois,
                                         spatial_scale=1 / 8,
                                         interpret=True, rois_per_step=3))
    np.testing.assert_array_equal(got, base)
    # RT > _R_MAX: chunk floors to 0 without the guard -> must still run
    monkeypatch.setattr(RPP, "_R_MAX", 2)
    got2 = np.asarray(RPP.roi_pool_pallas(feats, rois,
                                          spatial_scale=1 / 8,
                                          interpret=True, rois_per_step=4))
    np.testing.assert_array_equal(got2, base)


def test_custom_vjp_grad_matches_xla(rng):
    """Pallas equality-replay backward == XLA autodiff backward on
    distinct-valued features (interpret mode; ties absent by
    construction so the tie-semantics divergence cannot trigger)."""
    import jax

    from mv3d_tf_tpu.ops.roi_pool import _make_roi_pool_cvjp, roi_pool

    H, W, C = 20, 28, 8
    feat = jnp.asarray(
        rng.permutation(H * W * C).reshape(H, W, C).astype(np.float32))
    rois = jnp.asarray(np.array([
        [0, 8, 16, 120, 150],
        [0, 0, 0, 30, 40],
        [0, 100, 60, 200, 140],
        [0, 215, 150, 223, 159],   # right/bottom edge
    ], np.float32))
    dy = jnp.asarray(rng.rand(4, 7, 7, C).astype(np.float32))

    def loss_xla(f):
        return jnp.sum(roi_pool(f, rois, spatial_scale=1.0 / 8) * dy)

    cvjp = _make_roi_pool_cvjp(7, 1.0 / 8, None, None, interpret=True)

    def loss_pallas(f):
        return jnp.sum(cvjp(f, rois) * dy)

    g_xla = np.asarray(jax.grad(loss_xla)(feat))
    g_pal = np.asarray(jax.grad(loss_pallas)(feat))
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-6, atol=1e-6)
    assert np.abs(g_xla).sum() > 0


def test_custom_vjp_ties_split_evenly(rng):
    """All-zero (post-ReLU-sparse) bins: the equality-replay backward
    splits the cotangent evenly among tying cells — the per-bin gradient
    mass equals dy, NOT dy x tie-count (ADVICE r1 medium)."""
    import jax

    from mv3d_tf_tpu.ops.roi_pool import _make_roi_pool_cvjp

    H, W, C = 16, 16, 8
    feat = jnp.zeros((H, W, C), jnp.float32)      # every bin fully tied
    rois = jnp.asarray(np.array([[0, 0, 0, 120, 120]], np.float32))
    dy = jnp.ones((1, 7, 7, C), jnp.float32)

    cvjp = _make_roi_pool_cvjp(7, 1.0 / 8, None, None, interpret=True)
    g = np.asarray(jax.grad(lambda f: jnp.sum(cvjp(f, rois) * dy))(feat))
    # total gradient mass == number of (non-empty bin, channel) pairs
    np.testing.assert_allclose(g.sum(), 7 * 7 * C, rtol=1e-5)
    # a 16x16 map under a full-cover roi: bins tile the map, every cell
    # belongs to >=1 bin, and cells in a k-cell bin get 1/k per bin
    assert (g > 0).all()

    # partial ties: two equal maxima inside one bin each get dy/2
    feat2 = np.zeros((8, 8, 1), np.float32)
    feat2[1, 1, 0] = 5.0
    feat2[2, 3, 0] = 5.0
    rois2 = jnp.asarray(np.array([[0, 0, 0, 63, 63]], np.float32))
    cvjp2 = _make_roi_pool_cvjp(1, 1.0 / 8, None, None, interpret=True)
    g2 = np.asarray(jax.grad(
        lambda f: jnp.sum(cvjp2(f, rois2)))(jnp.asarray(feat2)))
    np.testing.assert_allclose(g2[1, 1, 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(g2[2, 3, 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(g2.sum(), 1.0, rtol=1e-6)


def test_int8_features_xla_path(rng):
    """int8 feature maps pool exactly like dequantize-then-pool (max
    commutes with the monotone dequant); empty bins stay 0."""
    q = rng.randint(0, 128, (20, 24, 8)).astype(np.int8)
    s = np.float32(0.037)
    rois = _rand_rois(rng, 24, 160, 192)
    rois[0] = [0, 10, 10, 10, 10]  # degenerate -> some empty bins
    got_q = np.asarray(roi_pool(jnp.asarray(q), jnp.asarray(rois),
                                pooled=7, spatial_scale=1 / 8))
    ref = np.asarray(roi_pool(jnp.asarray(q.astype(np.float32) * s),
                              jnp.asarray(rois), pooled=7,
                              spatial_scale=1 / 8))
    np.testing.assert_allclose(got_q.astype(np.float32) * s, ref,
                               rtol=1e-6, atol=1e-6)


def test_int8_features_pallas_interpret(rng):
    """The Pallas kernel on int8 features matches the XLA path
    (interpret mode; real-chip coverage in tools/tpu_selfcheck.py)."""
    from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
    q = rng.randint(0, 128, (2, 20, 24, 128)).astype(np.int8)
    rois = _rand_rois(rng, 24, 160, 192)
    # rois_per_step blocks may not straddle frames: 12 rois per frame
    rois[12:, 0] = 1.0
    got = np.asarray(roi_pool_pallas(jnp.asarray(q), jnp.asarray(rois),
                                     pooled=7, spatial_scale=1 / 8,
                                     interpret=True, rois_per_step=12))
    ref = np.asarray(roi_pool(jnp.asarray(q), jnp.asarray(rois),
                              pooled=7, spatial_scale=1 / 8))
    np.testing.assert_array_equal(got, ref)


def test_pallas_windowed_rowmax_wide_map_interpret(rng):
    """The segmented row-max (RWIN=32 < W_pad) must stay bit-exact on an
    image-scale map for narrow, wide (multi-segment), right-edge
    (clamped segments + clamped pw window), and sub-cell rois — the
    existing tests use W<=24 where the window covers the whole width."""
    from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
    H, W = 40, 156                       # W_pad=160 > RWIN=32
    feat = rng.randn(H, W, 8).astype(np.float32)
    rois = np.array([
        [0, 40, 40, 120, 90],        # typical car (10 cells wide)
        [0, 0, 0, 8 * W - 1, 8 * H - 1],   # full map (5 segments)
        [0, 8 * W - 60, 80, 8 * W - 2, 140],  # hugs the right edge
        [0, 0, 8, 50, 60],           # left edge
        [0, 500, 100, 503, 102],     # sub-cell (empty-ish bins)
        [0, 1000, 200, 1040, 230],
    ], np.float32)
    got = np.asarray(roi_pool_pallas(feat, rois, spatial_scale=1 / 8,
                                     max_in_h=8 * H, max_in_w=8 * W,
                                     interpret=True))
    exp = roi_pool_np(feat, rois, spatial_scale=1 / 8)
    np.testing.assert_array_equal(got, exp)
    # blocked variant on the same wide map
    got2 = np.asarray(roi_pool_pallas(feat, rois, spatial_scale=1 / 8,
                                      max_in_h=8 * H, max_in_w=8 * W,
                                      interpret=True, rois_per_step=3))
    np.testing.assert_array_equal(got2, exp)
