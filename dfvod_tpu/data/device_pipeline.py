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


def maybe_device_normalize(images, mask_or_sizes):
    """Dispatch helper for train/eval steps: uint8 images mean the loader
    deferred normalization to the device (mask_or_sizes = sizes (B,2));
    f32 images pass through (mask_or_sizes = the precomputed mask)."""
    if images.dtype == jnp.uint8:
        return device_normalize(images, mask_or_sizes)
    return images, mask_or_sizes
