"""Shared model layers: MSDeformAttn module, MHA, MLP, FFN blocks.

Parity targets in the reference:
- ``MSDeformAttn``   : ``models/ops/modules/ms_deform_attn.py:30-117``
  (learned sampling offsets with ring-of-directions bias init, attention
  weights softmaxed over L*P, value/output projections around the kernel).
- ``MLP``            : ``models/deformable_detr_single.py:606-618``.
- decoder self-attn  : ``torch.nn.MultiheadAttention`` equivalent.

All modules are channels-last and static-shape; ``spatial_shapes`` is a
Python tuple so level loops unroll at trace time.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.ops import ms_deform_attn


def gelu(x):
    # torch F.gelu default is the exact (erf) form.
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "gelu": gelu,
    "glu": jax.nn.glu,
}

xavier_uniform = nn.initializers.xavier_uniform()


def dense(features: int, name: Optional[str] = None,
          kernel_init=xavier_uniform) -> nn.Dense:
    return nn.Dense(features, name=name, kernel_init=kernel_init,
                    bias_init=nn.initializers.zeros)


class QDense(nn.Module):
    """Drop-in ``nn.Dense`` (identical param tree: kernel (K,N) + bias)
    that runs W8A8 int8 when ``ops/quant.int8_mode`` is active at trace
    time. The default path replicates flax Dense exactly (promote dtypes,
    dot_general, bias add) so swapping a call site cannot move parity."""
    features: int
    kernel_init: nn.initializers.Initializer = xavier_uniform
    tag: str = "dense"

    @nn.compact
    def __call__(self, x):
        from flax.linen.dtypes import promote_dtype

        from dfvod_tpu.ops import quant
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if quant.enabled(self.tag):
            return quant.dense_int8(x, kernel, bias)
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Ring-of-directions bias init (``ms_deform_attn.py:62-70``)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        del key
        flat = grid.reshape(-1)
        assert flat.shape == tuple(shape), (flat.shape, shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module around the MSDA kernel."""
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "auto"

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 input_padding_mask=None):
        """
        Args:
          query: (B, Lq, C)
          reference_points: (B, Lq, L, 2) in [0,1] or (B, Lq, L, 4) boxes.
          input_flatten: (B, S, C) with S = sum(H*W)
          spatial_shapes: static tuple of (H, W).
          input_padding_mask: (B, S) bool, True for padding.
        Returns: (B, Lq, C)
        """
        assert self.d_model % self.n_heads == 0
        M, D = self.n_heads, self.d_model // self.n_heads
        L, P = self.n_levels, self.n_points
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]

        # QDense: int8-capable in serving mode (ops/quant.py); the
        # sampling_offsets/attention_weights heads stay full precision
        # (tiny matmuls whose outputs feed coordinate math).
        value = QDense(self.d_model, name="value_proj",
                       tag="proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(B, S, M, D)

        offsets = nn.Dense(
            M * L * P * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(M, L, P))(query)
        offsets = offsets.reshape(B, Lq, M, L, P, 2)

        attw = nn.Dense(M * L * P, name="attention_weights",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(query)
        attw = jax.nn.softmax(attw.reshape(B, Lq, M, L * P), axis=-1)
        attw = attw.reshape(B, Lq, M, L, P)

        if reference_points.shape[-1] == 2:
            # normalize offsets by (W, H) per level
            wh = jnp.asarray([[w, h] for h, w in spatial_shapes],
                             dtype=offsets.dtype)  # (L, 2) in (x, y) order
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / wh[None, None, None, :, None, :])
        elif reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / P
                   * reference_points[:, :, None, :, None, 2:] * 0.5)
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(value, tuple(spatial_shapes), loc, attw,
                             impl=self.impl)
        return QDense(self.d_model, name="output_proj", tag="proj")(out)


class MultiHeadAttention(nn.Module):
    """Standard softmax MHA (decoder/TQE self+cross attention).

    Functional equivalent of ``torch.nn.MultiheadAttention`` (packed qkv
    projection + output projection, scaled dot-product softmax).
    """
    d_model: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True,
                 key_padding_mask=None):
        M = self.n_heads
        D = self.d_model // M
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qp = dense(self.d_model, name="q_proj")(q).reshape(B, Lq, M, D)
        kp = dense(self.d_model, name="k_proj")(k).reshape(B, Lk, M, D)
        vp = dense(self.d_model, name="v_proj")(v).reshape(B, Lk, M, D)
        logits = jnp.einsum("bqmd,bkmd->bmqk", qp, kp,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(D)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :],
                               jnp.finfo(logits.dtype).min, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(qp.dtype)
        if self.dropout > 0 and not deterministic:
            probs = nn.Dropout(self.dropout)(probs,
                                             deterministic=deterministic)
        out = jnp.einsum("bmqk,bkmd->bqmd", probs, vp)
        out = out.reshape(B, Lq, self.d_model)
        return dense(self.d_model, name="out_proj")(out)


class MLP(nn.Module):
    """Simple ReLU MLP head (``deformable_detr_single.py:606-618``)."""
    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            feats = self.output_dim if is_last else self.hidden_dim
            x = dense(feats, name=f"layers_{i}")(x)
            if not is_last:
                x = jax.nn.relu(x)
        return x


class FFN(nn.Module):
    """Transformer FFN block: Linear -> act -> dropout -> Linear -> residual
    -> LayerNorm (``deformable_transformer_single.py:544-548``)."""
    d_model: int
    d_ffn: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # QDense: identical to nn.Dense, plus the int8 serving path when
        # ``ops/quant.int8_mode`` is active (never during training — the
        # mode is enabled only by serving/bench entry points).
        h = QDense(self.d_ffn, name="linear1", tag="ffn")(x)
        h = ACTIVATIONS[self.activation](h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = QDense(self.d_model, name="linear2", tag="ffn")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm", epsilon=1e-5)(x + h)


class SingleLinearFFN(nn.Module):
    """One-linear FFN used by the fusion layers (GELU in the transformer
    fusion layers, ``deformable_transformer_single.py:372-377``; ReLU in the
    backbone cross-fusion layers, ``dformer_crossfusion_backbone.py:150``)."""
    d_model: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = ACTIVATIONS[self.activation](dense(self.d_model,
                                               name="linear1")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm", epsilon=1e-5)(x + h)


def with_pos(tensor, pos):
    return tensor if pos is None else tensor + pos
