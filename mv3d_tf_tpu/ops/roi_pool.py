"""ROI max-pooling — TPU-native replacement for the reference's custom
C++/CUDA TF op (lib/roi_pooling_layer/roi_pooling_op.cc,
roi_pooling_op_gpu.cu.cc:20-85).

Exact forward semantics of ROIPoolForward:
  * roi corners scaled by spatial_scale then C-style round() (half away
    from zero), malformed ROIs forced to 1x1 (cu.cc:38-45);
  * bin [hstart,hend) = [floor(ph*bin), ceil((ph+1)*bin)) + roi offset,
    clipped to the feature extent (cu.cc:51-64);
  * empty bins output 0 (cu.cc:65-68).

Instead of argmax bookkeeping + a replay backward (cu.cc:113-190), the
pool is expressed as a separable masked-gather max (rows then columns,
each bounded by a static max bin span), so jax.grad routes gradients to
the max locations automatically — same backward as argmax replay.

All shapes static: R rois, pooled x pooled bins, max bin spans derived
from the feature extent. No host transfer, fully fusible into the
surrounding jit program, vmap-able over frames.
"""

import functools

import jax
import jax.numpy as jnp


def _c_round(x):
    """C round(): half away from zero (cu.cc:38-41 uses ::round)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale",
                                             "max_in_h", "max_in_w",
                                             "chunk"))
def roi_pool(feat, rois, pooled=7, spatial_scale=1.0 / 8,
             max_in_h=None, max_in_w=None, chunk=None):
    """Max-pool ROIs from one feature map.

    Args:
      feat: (H, W, C) single frame, or (B, H, W, C) batched — the frame a
        roi pools from is its batch_idx column (native multi-frame
        pooling beats vmapping the gathers).
      rois: (R, 5) float32 [batch_idx, x1, y1, x2, y2] in input coords.
      pooled: output bins per side (7).
      spatial_scale: feature stride reciprocal (1/8).
      max_in_h / max_in_w: static bound on any roi's extent in INPUT
        pixels (callers with unclipped rois — e.g. image-view boxes that
        run past the frame — must pass their true bound; defaults assume
        rois are clipped to the feature extent).
      chunk: process rois in sequential blocks of this size (lax.map) —
        bounds the (chunk, pooled, W, C) stage-1 intermediate so large
        multi-frame roi sets don't exhaust HBM.
    Returns:
      (R, pooled, pooled, C) pooled features.
    """
    if chunk is not None and rois.shape[0] > chunk:
        r = rois.shape[0]
        pad = (-r) % chunk
        rois_p = jnp.concatenate(
            [rois, jnp.zeros((pad, 5), rois.dtype)], axis=0)
        blocks = rois_p.reshape(-1, chunk, 5)
        out = jax.lax.map(
            lambda rb: roi_pool(feat, rb, pooled=pooled,
                                spatial_scale=spatial_scale,
                                max_in_h=max_in_h, max_in_w=max_in_w),
            blocks)
        return out.reshape(-1, pooled, pooled, feat.shape[-1])[:r]

    batched = feat.ndim == 4
    if batched:
        _, H, W, C = feat.shape
        bidx = rois[:, 0].astype(jnp.int32)
    else:
        H, W, C = feat.shape
    R = rois.shape[0]
    dtype = feat.dtype

    xs = _c_round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    ys = _c_round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    xe = _c_round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    ye = _c_round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(xe - xs + 1, 1)
    roi_h = jnp.maximum(ye - ys + 1, 1)

    # Bin bounds in EXACT integer arithmetic:
    #   floor(ph*rh/P) == (ph*rh)//P,  ceil((ph+1)*rh/P) == ((ph+1)*rh+P-1)//P
    # The CUDA kernel computes these in f32 (cu.cc:46-58), whose rounding
    # at exact bin multiples is unstable under XLA fast-math (jit vs eager
    # disagree); integer bounds are deterministic and compiler-stable, and
    # differ from the CUDA result only at those exact-boundary artifacts.
    ph = jnp.arange(pooled, dtype=jnp.int32)
    hstart = jnp.clip((ph[None, :] * roi_h[:, None]) // pooled + ys[:, None],
                      0, H)
    hend = jnp.clip(((ph[None, :] + 1) * roi_h[:, None] + pooled - 1) // pooled
                    + ys[:, None], 0, H)
    wstart = jnp.clip((ph[None, :] * roi_w[:, None]) // pooled + xs[:, None],
                      0, W)
    wend = jnp.clip(((ph[None, :] + 1) * roi_w[:, None] + pooled - 1) // pooled
                    + xs[:, None], 0, W)

    # static max bin spans: a bin of a roi spanning S input px covers at
    # most ceil((round(S*scale)+1)/pooled)+1 feature rows; clipping to the
    # feature extent only ever shrinks a bin
    span_h = (max_in_h if max_in_h is not None else H / spatial_scale)
    span_w = (max_in_w if max_in_w is not None else W / spatial_scale)
    cells_h = int(round(span_h * spatial_scale)) + 1
    cells_w = int(round(span_w * spatial_scale)) + 1
    mb_h = min(H, -(-cells_h // pooled) + 2)
    mb_w = min(W, -(-cells_w // pooled) + 2)

    # int8 feature maps (quantized trunk) have no -inf; the dtype min is
    # an exact identity for max (values are [0,127] post-requant-relu)
    neg = (jnp.asarray(jnp.iinfo(dtype).min, dtype)
           if jnp.issubdtype(dtype, jnp.integer)
           else jnp.asarray(-jnp.inf, dtype))
    hs_i, ws_i = hstart, wstart
    hlen = hend - hstart
    wlen = wend - wstart

    # stage 1: per (roi, ph) max over bin rows -> (R, pooled, W, C)
    # (unrolled: ~mb_h+mb_w gathers fuse well and the HLO stays small;
    # the big-program hazard is closed-over params, not this unroll)
    def h_body(k, m1):
        idx = jnp.clip(hs_i + k, 0, H - 1)              # (R, pooled)
        if batched:
            rows = feat[bidx[:, None], idx]             # (R, pooled, W, C)
        else:
            rows = feat[idx]                            # (R, pooled, W, C)
        ok = (k < hlen)[:, :, None, None]
        return jnp.maximum(m1, jnp.where(ok, rows, neg))

    m1 = jnp.full((R, pooled, W, C), neg, dtype)
    for k in range(mb_h):
        m1 = h_body(k, m1)

    # stage 2: per (roi, ph, pw) max over bin cols -> (R, pooled, pooled, C)
    m1t = jnp.swapaxes(m1, 1, 2)                        # (R, W, pooled, C)

    def w_body(k, out):
        idx = jnp.clip(ws_i + k, 0, W - 1)              # (R, pooled)
        cols = jnp.take_along_axis(m1t, idx[:, :, None, None], axis=1)
        cols = jnp.swapaxes(cols, 1, 2)                 # (R, pooled, pooled, C)
        ok = (k < wlen)[:, None, :, None]
        return jnp.maximum(out, jnp.where(ok, cols, neg))

    out = jnp.full((R, pooled, pooled, C), neg, dtype)
    for k in range(mb_w):
        out = w_body(k, out)

    # empty bins -> 0 (cu.cc:65-68)
    is_empty = ((hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :])
    return jnp.where(is_empty[..., None], jnp.zeros((), dtype), out)


def roi_pool_fast(feat, rois, pooled=7, spatial_scale=1.0 / 8,
                  max_in_h=None, max_in_w=None, chunk=None,
                  rois_per_step=1):
    """Inference dispatch: the Pallas kernel on TPU (3-4x faster, VMEM
    resident), the XLA formulation elsewhere. NOT differentiable on TPU
    (the kernel has no VJP) — training uses roi_pool directly.

    rois_per_step: Pallas-path roi-block size (see roi_pool_pallas);
    callers must pick a divisor of their per-frame roi count."""
    import jax as _jax
    if _jax.default_backend() in ("tpu", "axon"):
        from mv3d_tf_tpu.ops.roi_pool_pallas import roi_pool_pallas
        return roi_pool_pallas(feat, rois, pooled=pooled,
                               spatial_scale=spatial_scale,
                               max_in_h=max_in_h, max_in_w=max_in_w,
                               rois_per_step=rois_per_step)
    return roi_pool(feat, rois, pooled=pooled, spatial_scale=spatial_scale,
                    max_in_h=max_in_h, max_in_w=max_in_w, chunk=chunk)


@functools.lru_cache(maxsize=None)
def _make_roi_pool_cvjp(pooled, spatial_scale, max_in_h, max_in_w,
                        interpret=False):
    """custom_vjp ROI pool: Pallas forward + Pallas equality-replay
    backward (see roi_pool_pallas_bwd for tie semantics)."""
    from mv3d_tf_tpu.ops.roi_pool_pallas import (roi_pool_pallas,
                                                 roi_pool_pallas_bwd)

    @jax.custom_vjp
    def f(feat, rois):
        return roi_pool_pallas(feat, rois, pooled=pooled,
                               spatial_scale=spatial_scale,
                               max_in_h=max_in_h, max_in_w=max_in_w,
                               interpret=interpret)

    def f_fwd(feat, rois):
        out = f(feat, rois)
        return out, (feat, rois, out)

    def f_bwd(res, dy):
        feat, rois, out = res
        dfeat = roi_pool_pallas_bwd(feat, rois, out, dy, pooled=pooled,
                                    spatial_scale=spatial_scale,
                                    max_in_h=max_in_h, max_in_w=max_in_w,
                                    interpret=interpret)
        return dfeat.astype(feat.dtype), jnp.zeros_like(rois)

    f.defvjp(f_fwd, f_bwd)
    return f


def roi_pool_train(feat, rois, pooled=7, spatial_scale=1.0 / 8,
                   max_in_h=None, max_in_w=None):
    """Differentiable ROI pool for the single-frame train path.

    On TPU: Pallas forward + Pallas equality-replay backward via
    custom_vjp — the XLA gather formulation's autodiff backward
    materializes mb_h+mb_w scatter-add slabs and costs ~50 ms/step at
    full size (measured); the replay kernel is ~ the forward's cost.
    On any non-TPU backend (tests, fallback): the XLA formulation with
    plain autodiff.
    """
    if jax.default_backend() not in ("tpu", "axon"):
        return roi_pool(feat, rois, pooled=pooled,
                        spatial_scale=spatial_scale,
                        max_in_h=max_in_h, max_in_w=max_in_w)
    return _make_roi_pool_cvjp(pooled, spatial_scale, max_in_h,
                               max_in_w)(feat, rois)


def roi_pool_np(feat, rois, pooled=7, spatial_scale=1.0 / 8):
    """Direct numpy transliteration of the CUDA loops (test oracle).

    Bin boundaries use the same exact integer arithmetic as roi_pool
    (see the note there: the CUDA kernel's f32 boundaries are unstable
    under XLA fast-math, so the framework defines integer-exact bins).
    """
    import numpy as np
    f32 = np.float32
    H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, pooled, pooled, C), feat.dtype)
    for r in range(R):
        def cround(v):
            return int(np.sign(v) * np.floor(abs(f32(v)) + f32(0.5)))
        xs = cround(f32(rois[r, 1]) * f32(spatial_scale))
        ys = cround(f32(rois[r, 2]) * f32(spatial_scale))
        xe = cround(f32(rois[r, 3]) * f32(spatial_scale))
        ye = cround(f32(rois[r, 4]) * f32(spatial_scale))
        roi_w = max(xe - xs + 1, 1)
        roi_h = max(ye - ys + 1, 1)
        for ph in range(pooled):
            for pw in range(pooled):
                h0 = min(max((ph * roi_h) // pooled + ys, 0), H)
                h1 = min(max(((ph + 1) * roi_h + pooled - 1) // pooled + ys, 0), H)
                w0 = min(max((pw * roi_w) // pooled + xs, 0), W)
                w1 = min(max(((pw + 1) * roi_w + pooled - 1) // pooled + xs, 0), W)
                if h1 <= h0 or w1 <= w0:
                    continue
                out[r, ph, pw] = feat[h0:h1, w0:w1].max(axis=(0, 1))
    return out
