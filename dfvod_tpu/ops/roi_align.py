"""RoIAlign — XLA-native bilinear crop-and-pool, NHWC.

TPU replacement for ``mmcv.ops.RoIAlign(output_size=7, sampling_ratio=2,
aligned=True)`` used by TransVOD++'s Query-RoI Fusion
(``deformable_transformer_multi_plusplus.py:129-132, 493-518``). Pure
gather + average — XLA fuses this well; no custom kernel needed
(SURVEY.md §7.8).

Semantics (mmcv/detectron2 ``aligned=True``):
- roi coords scaled by ``spatial_scale`` then shifted by -0.5 (pixel-center
  alignment)
- each of the ``P x P`` output bins is sampled at ``sampling_ratio^2``
  regularly spaced points, bilinearly interpolated, then averaged
- sample points outside [-1, H] (resp. W) contribute 0; coordinates are
  clamped to the valid range otherwise
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(feat, y, x):
    """feat: (H, W, C); y/x: (S,) sample coords. Returns (S, C)."""
    H, W, _ = feat.shape
    oob = (y < -1.0) | (y > H) | (x < -1.0) | (x > W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (v00 * (hy * hx)[:, None] + v01 * (hy * lx)[:, None]
           + v10 * (ly * hx)[:, None] + v11 * (ly * lx)[:, None])
    return jnp.where(oob[:, None], 0.0, out)


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, *,
              output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = True) -> jnp.ndarray:
    """features: (B, H, W, C); boxes: (B, R, 4) xyxy in *image* coords.

    Returns (B, R, output_size, output_size, C). Each roi pools from its
    own batch element (the reference's ``bbox2roi`` batch-index column is
    implicit in the (B, R) layout).
    """
    P, sr = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0

    def one_roi(feat, box):
        x1, y1, x2, y2 = (box * spatial_scale) - offset
        rw = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
        rh = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
        bin_h, bin_w = rh / P, rw / P
        # sample grid: P*sr points per axis at bin-subdivision centers
        iy = (jnp.arange(P * sr) + 0.5) / sr
        ys = y1 + iy * bin_h                     # (P*sr,)
        xs = x1 + iy * bin_w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        vals = _bilinear(feat, yy.reshape(-1), xx.reshape(-1))
        vals = vals.reshape(P, sr, P, sr, -1)
        return vals.mean(axis=(1, 3))            # (P, P, C)

    return jax.vmap(lambda feat, bxs: jax.vmap(
        lambda b: one_roi(feat, b))(bxs))(features, boxes)
