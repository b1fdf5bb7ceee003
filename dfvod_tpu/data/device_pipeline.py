"""On-device preprocessing — the BASELINE.json north-star item: "paired
RGB+depth resize/normalize runs as an on-device pipeline feeding
HBM-resident clips".

The host (C++ native path) does the variable-shape work (decode + aspect
resize + pad to the static bucket) on uint8; the device receives uint8
frames — 4x less H2D traffic than f32 — and the [0,1] scale + mean/std
normalization runs inside the same jit program as the model, where XLA
fuses it into the first convolution. The padding mask is reconstructed
on device from the per-frame content sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.data.transforms import (
    DEPTH_MEAN,
    DEPTH_STD,
    RGB_MEAN,
    RGB_STD,
)


def device_normalize(images_u8: jnp.ndarray, sizes: jnp.ndarray):
    """uint8 (B, H, W, C) + content sizes (B, 2) -> (f32 normalized image,
    bool padding mask). Runs under jit; zero out the padded region so the
    contract matches the host path exactly."""
    B, H, W, C = images_u8.shape
    mean = np.concatenate([RGB_MEAN, [DEPTH_MEAN]])[:C].astype(np.float32)
    std = np.concatenate([RGB_STD, [DEPTH_STD]])[:C].astype(np.float32)
    x = images_u8.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - mean[None, None, None]) / std[None, None, None]
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    mask = (ys >= sizes[:, 0][:, None, None]) | \
           (xs >= sizes[:, 1][:, None, None])
    x = jnp.where(mask[..., None], 0.0, x)
    return x, mask


def pack_s2d(images_u8: np.ndarray) -> np.ndarray:
    """Host-side 2x2 space-to-depth packing of a uint8 batch:
    (B, H, W, C) -> (B, H/2, W/2, 4C) with channel blocks ordered
    (dy, dx) = (0,0), (0,1), (1,0), (1,1) and the C source channels
    kept contiguous *per spatial offset* — RGB-D input packs to
    [R00 G00 B00 R01 ... B11 | D00 D01 D10 D11] so the model can split
    the 12 RGB s2d channels from the 4 depth s2d channels by slicing.

    Why on host: the same rearrangement on device materialized ~2.6 ms
    of full-image relayout copies per B=8 608x800 step (PERF.md); done
    here it is a strided memcpy on uint8 and the H2D transfer carries
    the identical bytes.
    """
    B, H, W, C = images_u8.shape
    assert H % 2 == 0 and W % 2 == 0, "s2d packing needs even H, W"
    # only 3 (RGB) and 4 (RGB-D) channel inputs produce the 12/16-channel
    # packed forms the rest of the stack can dispatch on; a C=1 depth-only
    # pack would alias the unpacked RGB-D path in maybe_device_normalize
    assert C in (3, 4), f"pack_s2d expects RGB or RGB-D input, got C={C}"
    out = np.empty((B, H // 2, W // 2, 4 * C), images_u8.dtype)
    rgb_c = 3
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        part = images_u8[:, dy::2, dx::2, :]
        out[..., k * rgb_c:(k + 1) * rgb_c] = part[..., :rgb_c]
        if C == 4:
            out[..., 4 * rgb_c + k] = part[..., 3]
    return out


def device_normalize_s2d(packed_u8: jnp.ndarray, sizes: jnp.ndarray):
    """Normalize a host-packed s2d uint8 batch (see ``pack_s2d``).

    packed_u8: (B, H/2, W/2, 12|16) uint8; sizes: (B, 2) full-resolution
    content sizes. Returns (normalized f32 packed image, full-resolution
    bool padding mask). The padded region is zeroed per s2d block with
    its own (dy, dx)-shifted validity test, so the result is bit-equal
    to ``device_normalize`` followed by the stems' internal s2d.
    """
    B, H2, W2, C4 = packed_u8.shape
    assert C4 in (12, 16), C4
    rgb = np.tile(np.stack([RGB_MEAN, RGB_STD]), (1, 4))
    mean = np.concatenate(
        [rgb[0], [DEPTH_MEAN] * 4])[:C4].astype(np.float32)
    std = np.concatenate([rgb[1], [DEPTH_STD] * 4])[:C4].astype(np.float32)
    x = packed_u8.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - mean[None, None, None]) / std[None, None, None]
    ys = jnp.arange(H2)[None, :, None]
    xs = jnp.arange(W2)[None, None, :]
    sh = sizes[:, 0][:, None, None]
    sw = sizes[:, 1][:, None, None]
    rgb_c = 3 if C4 == 16 else min(3, C4 // 4)
    parts = []
    blk_masks = {}
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        blk_masks[k] = (2 * ys + dy >= sh) | (2 * xs + dx >= sw)
    for k in range(4):
        parts.append(jnp.where(blk_masks[k][..., None], 0.0,
                               x[..., k * rgb_c:(k + 1) * rgb_c]))
    if C4 == 16:
        for k in range(4):
            parts.append(jnp.where(blk_masks[k], 0.0, x[..., 12 + k])
                         [..., None])
    x = jnp.concatenate(parts, axis=-1)
    ysf = jnp.arange(2 * H2)[None, :, None]
    xsf = jnp.arange(2 * W2)[None, None, :]
    mask = (ysf >= sh) | (xsf >= sw)
    return x, mask


def maybe_device_normalize(images, mask_or_sizes):
    """Dispatch helper for train/eval steps: uint8 images mean the loader
    deferred normalization to the device (mask_or_sizes = sizes (B,2));
    uint8 with 12/16 channels is the host-packed s2d form (``pack_s2d``);
    f32 images pass through (mask_or_sizes = the precomputed mask)."""
    if images.dtype == jnp.uint8:
        if images.shape[-1] in (12, 16):
            return device_normalize_s2d(images, mask_or_sizes)
        return device_normalize(images, mask_or_sizes)
    return images, mask_or_sizes
