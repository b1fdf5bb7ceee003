"""2-D sine / learned position embeddings.

Parity with the reference ``models/position_encoding.py:20-97`` (DETR sine
embedding computed from the cumulative sum of the unpadded-pixel mask,
``normalize=True``), re-expressed channels-last for TPU layouts.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def sine_position_embedding(not_mask, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            normalize: bool = True,
                            scale: float = 2 * math.pi):
    """Sine position embedding from a validity mask.

    Args:
      not_mask: (B, H, W) float/bool, 1 for valid (unpadded) pixels.
    Returns:
      (B, H, W, 2 * num_pos_feats) — y-embedding then x-embedding, matching
      the reference channel order (``position_encoding.py:55``).
    """
    not_mask = not_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t  # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def _interleave_sincos(vals, dim_t):
    """vals (..., 1) / dim_t (F,) -> DETR sin/cos interleave (..., F)."""
    p = vals / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                     axis=-1).reshape(*p.shape[:-1], -1)


def sine_position_embedding_rect(not_mask, num_pos_feats: int = 128,
                                 temperature: float = 10000.0,
                                 scale: float = 2 * math.pi):
    """``sine_position_embedding`` specialized to rectangular top-left
    validity masks — the only masks this model ever produces (bucket
    padding is bottom/right; same assumption as ``get_valid_ratio``).

    For a rectangular mask the cumsum field is product-separable:
    ``y_embed[i, j] = min(i+1, valid_h) * colvalid[j]``, so after
    normalization every pixel's value is either a row-table entry or the
    padded-region constant ``-0.5/eps * scale``. That turns the
    (B, H, W, 2F) transcendental grid (9.7M sin/cos at the 38x50
    production shape) into (B, (H+W), F) tables (~90k) plus broadcasts
    and selects. Output is exactly equal to the general form (tested).
    """
    not_mask = not_mask.astype(jnp.float32)
    B, H, W = not_mask.shape
    eps = 1e-6
    valid_h = jnp.sum(not_mask[:, :, 0], axis=1)      # (B,)
    valid_w = jnp.sum(not_mask[:, 0, :], axis=1)
    rows = jnp.arange(1, H + 1, dtype=jnp.float32)
    cols = jnp.arange(1, W + 1, dtype=jnp.float32)
    r = jnp.minimum(rows[None, :], valid_h[:, None])  # (B, H) cumsum row
    c = jnp.minimum(cols[None, :], valid_w[:, None])  # (B, W)
    r = (r - 0.5) / (valid_h[:, None] + eps) * scale
    c = (c - 0.5) / (valid_w[:, None] + eps) * scale
    k = jnp.float32(-0.5 / eps * scale)               # padded-region value

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    ty = _interleave_sincos(r[..., None], dim_t)      # (B, H, F)
    tx = _interleave_sincos(c[..., None], dim_t)      # (B, W, F)
    tk = _interleave_sincos(jnp.full((1,), k), dim_t)  # (F,)

    rowvalid = not_mask[:, :, 0] > 0                  # (B, H)
    colvalid = not_mask[:, 0, :] > 0                  # (B, W)
    pos_y = jnp.where(colvalid[:, None, :, None],
                      ty[:, :, None, :], tk)          # (B, H, W, F)
    pos_x = jnp.where(rowvalid[:, :, None, None],
                      tx[:, None, :, :], tk)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute embedding (``position_encoding.py:59-84``)."""
    num_pos_feats: int = 128
    max_size: int = 50

    @nn.compact
    def __call__(self, not_mask):
        B, H, W = not_mask.shape
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats))
        x_emb = col[:W][None, :, :]            # (1, W, F)
        y_emb = row[:H][:, None, :]            # (H, 1, F)
        pos = jnp.concatenate([
            jnp.broadcast_to(x_emb, (H, W, self.num_pos_feats)),
            jnp.broadcast_to(y_emb, (H, W, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * self.num_pos_feats))


def proposal_pos_embed(proposals, num_pos_feats: int = 128,
                       temperature: float = 10000.0):
    """Sine embedding of (sigmoided) proposal boxes for the two-stage path.

    Parity with ``deformable_transformer_single.py:108-121``.
    proposals: (..., 4) unactivated; returns (..., 4 * num_pos_feats).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos = jax.nn.sigmoid(jnp.asarray(proposals)) * scale
    pos = pos[..., None] / dim_t  # (..., 4, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(*pos.shape[:-3], -1)
