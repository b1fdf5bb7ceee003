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

import os

import jax
import jax.numpy as jnp
import numpy as np


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


def _hat_supported(features) -> bool:
    """Gate for the Pallas hat-sampling RoIAlign path: bf16 features on
    TPU, value slab + W tile within VMEM budget, kernel probe green."""
    if os.environ.get("DFVOD_ROI_IMPL") == "xla":
        return False
    if features.dtype != jnp.bfloat16:
        return False
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
    except Exception:
        return False
    from dfvod_tpu.ops import msda_pallas
    B, H, W, C = features.shape
    S = H * W
    vmem = S * max(C, 128) * 2 + msda_pallas._TQ_OH * S * 4
    if vmem > 8 * 1024 * 1024:
        return False
    return msda_pallas._hat_probe()


def _roi_align_hat(features, ycl, xcl, oob, P, sr, interpret=False):
    """RoIAlign through the gather-free hat kernel: one query per output
    bin, the sr^2 sample points folded as kernel points with weight
    1/sr^2 (the bin average happens inside the matmul — no pooling
    epilogue). Coordinates arrive pre-clamped, so the hat weights equal
    mmcv's border-clamped bilinear weights exactly; out-of-roi points
    ([-1, H] overshoot) are zeroed via the weight."""
    from dfvod_tpu.ops.msda_pallas import hat_sample_vjp
    B, H, W, C = features.shape
    R = ycl.shape[1]
    G = P * sr
    yy = jnp.broadcast_to(ycl, (B, R, G, G))
    xx = jnp.broadcast_to(xcl, (B, R, G, G))
    aw = jnp.broadcast_to((~oob).astype(jnp.float32) / (sr * sr),
                          (B, R, G, G))
    # (G, G) = (bin_y, sub_y, bin_x, sub_x) -> (bin_y, bin_x, sub_y, sub_x)
    def to_bins(a):
        a = a.reshape(B, R, P, sr, P, sr).transpose(0, 1, 2, 4, 3, 5)
        return a.reshape(B, R * P * P, sr * sr)

    sx = jnp.asarray(np.tile(np.arange(W, dtype=np.float32), H))
    sy = jnp.asarray(np.repeat(np.arange(H, dtype=np.float32), W))
    # differentiable (Pallas backward) so bf16 training can keep the
    # hat path; box coords are stop-gradiented upstream (mmcv parity)
    out = hat_sample_vjp(interpret=interpret)(
        features.reshape(B, H * W, C), sx, sy,
        to_bins(xx), to_bins(yy), to_bins(aw))
    return out.reshape(B, R, P, P, C)


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, *,
              output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = True,
              impl: str = "auto", interpret: bool = False) -> jnp.ndarray:
    """features: (B, H, W, C); boxes: (B, R, 4) xyxy in *image* coords.

    Returns (B, R, output_size, output_size, C). Each roi pools from its
    own batch element (the reference's ``bbox2roi`` batch-index column is
    implicit in the (B, R) layout).

    Implementation: the same flat-table formulation as the MSDA op — all
    B*R*(P*sr)^2*4 bilinear corners become ONE row-gather from the
    flattened (B*H*W, C) map with fused corner/OOB weights, instead of
    nested vmapped fancy-indexing (measured 4x faster at the TransVOD++
    QRF shape: 8 frames x 300 rois x 7x7 on 38x50x256 memory).
    """
    B, H, W, C = features.shape
    R = boxes.shape[1]
    P, sr = output_size, sampling_ratio
    G = P * sr
    offset = 0.5 if aligned else 0.0

    # mmcv's RoIAlign implements no roi gradient (grad_input only), so
    # boxes must not receive cotangents here either — the reference's
    # QRF trains with exactly that cut.
    boxes = jax.lax.stop_gradient(boxes)
    b = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    floor_w = 1e-6 if aligned else 1.0
    bin_w = jnp.maximum(x2 - x1, floor_w)[..., None] / P    # (B, R, 1)
    bin_h = jnp.maximum(y2 - y1, floor_w)[..., None] / P
    frac = (jnp.arange(G, dtype=jnp.float32) + 0.5) / sr    # (G,)
    xs = x1[..., None] + frac * bin_w                        # (B, R, G)
    ys = y1[..., None] + frac * bin_h

    # all (y, x) sample pairs: (B, R, G, G)
    yy = ys[..., :, None]
    xx = xs[..., None, :]
    oob = ((yy < -1.0) | (yy > H) | (xx < -1.0) | (xx > W))
    ycl = jnp.clip(yy, 0.0, H - 1)
    xcl = jnp.clip(xx, 0.0, W - 1)

    if impl == "pallas_hat" or (impl == "auto" and _hat_supported(features)):
        return _roi_align_hat(features, ycl, xcl, oob, P, sr,
                              interpret=interpret)

    y0 = jnp.floor(ycl)
    x0 = jnp.floor(xcl)
    fy = (ycl - y0)[..., None]                               # (B,R,G,G,1)
    fx = (xcl - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)

    # 4 corners fused into one gather
    cy = jnp.stack([y0i, y0i, y1i, y1i], -1)                 # (B,R,G,G,4)
    cx = jnp.stack([x0i, x1i, x0i, x1i], -1)
    wgt = jnp.concatenate([(1 - fy) * (1 - fx), (1 - fy) * fx,
                           fy * (1 - fx), fy * fx], -1)      # (B,R,G,G,4)
    wgt = jnp.where(oob[..., None], 0.0, wgt)

    # NB: the Pallas one-hot kernel (``msda_pallas.onehot_sample``) wins
    # in isolation here (11.8 vs 15.7 ms at the QRF shape) but loses
    # in-model (the pallas_call is a fusion barrier between the memory
    # reshape and the pooling epilogue), so RoIAlign stays on the fused
    # XLA flat-gather.
    idx_local = (cy * W + cx).reshape(B, R * G * G, 4)
    w_flat = wgt.reshape(B, R * G * G, 4)
    table = features.reshape(B * H * W, C)
    idx = idx_local + (jnp.arange(B, dtype=jnp.int32) * (H * W)
                       )[:, None, None]
    g = jnp.take(table, idx.reshape(-1), axis=0)
    g = g.reshape(B, R * G * G, 4, C)
    vals = jnp.einsum("bqk,bqkc->bqc", w_flat.astype(g.dtype), g)
    vals = vals.reshape(B, R, P, sr, P, sr, C)
    return vals.mean(axis=(3, 5))
