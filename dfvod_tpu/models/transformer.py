"""Deformable-DETR transformer trunk with composable depth-fusion adapters.

Single module family covering the reference's
``models/deformable_transformer_single.py`` (785 LoC):

- encoder: 6x self-MSDeformAttn layers (``:520-593``)
- decoder: 6x (MHA self-attn + cross-MSDeformAttn) with iterative box
  refinement (``:596-748``), detection heads owned here so refinement and
  output heads share weights (mirrors the ``decoder.bbox_embed`` hack at
  ``deformable_detr_single.py:186``).
- LateFusion: one depth cross-attention layer applied to the flattened RGB
  tokens before the encoder, residual add (``:341-402``, hook ``:212-244``).
- Encoder Cross-Fusion: fusion layers interleaved after encoder layers 0-3,
  ``output += fusion(output, depth)`` (``:406-518``).
- two-stage proposal path (``:108-153, 308-322``).

TPU design: everything is static-shape; level metadata (``spatial_shapes``)
is a Python tuple so all level loops unroll at trace time; layer loops are
unrolled (6 layers, distinct weights). Tokens are kept channels-last
``(B, S, C)`` so every Dense lands on the MXU with C=256 lanes.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.models.layers import (
    FFN,
    MLP,
    MSDeformAttn,
    MultiHeadAttention,
    SingleLinearFFN,
    dense,
    with_pos,
)
from dfvod_tpu.models.position_encoding import proposal_pos_embed
from dfvod_tpu.utils.box_ops import inverse_sigmoid

SpatialShapes = Tuple[Tuple[int, int], ...]


def get_valid_ratio(mask):
    """Fraction of unpadded rows/cols per image. mask: (B,H,W) True=pad.
    Returns (B, 2) as (ratio_w, ratio_h). Parity:
    ``deformable_transformer_single.py:155-162``."""
    not_mask = ~mask
    _, H, W = mask.shape
    valid_h = jnp.sum(not_mask[:, :, 0].astype(jnp.float32), axis=1)
    valid_w = jnp.sum(not_mask[:, 0, :].astype(jnp.float32), axis=1)
    return jnp.stack([valid_w / W, valid_h / H], axis=-1)


def encoder_reference_points(spatial_shapes: SpatialShapes, valid_ratios):
    """Per-token reference points: pixel centers normalized by the valid
    region, then scaled by every level's valid ratio.
    Returns (B, S, L, 2). Parity: ``:164-177``."""
    B = valid_ratios.shape[0]
    refs = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5)
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5)
        ref_y = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)
        ref_x = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)
        ref_y = ref_y[None] / (valid_ratios[:, None, lvl, 1] * H)
        ref_x = ref_x[None] / (valid_ratios[:, None, lvl, 0] * W)
        refs.append(jnp.stack([ref_x, ref_y], axis=-1))  # (B, H*W, 2)
    ref = jnp.concatenate(refs, axis=1)                   # (B, S, 2)
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def flatten_levels(srcs, masks, pos_embeds, level_embed=None):
    """Flatten per-level (B,H,W,C) maps into (B,S,C) tokens.

    Returns (src_flat, mask_flat, pos_flat, spatial_shapes). Parity with the
    flatten loop at ``deformable_transformer_single.py:182-208``.
    """
    spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
    src_flat = jnp.concatenate(
        [s.reshape(s.shape[0], -1, s.shape[-1]) for s in srcs], axis=1)
    mask_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1) for m in masks], axis=1)
    pos_list = []
    for lvl, p in enumerate(pos_embeds):
        p = p.reshape(p.shape[0], -1, p.shape[-1])
        if level_embed is not None:
            p = p + level_embed[lvl][None, None, :]
        pos_list.append(p)
    # keep the compute dtype of the token stream: the sine embedding is
    # built in f32, and letting it promote every pos-add downstream would
    # silently run the whole encoder in f32 during bf16 serving
    pos_flat = jnp.concatenate(pos_list, axis=1).astype(src_flat.dtype)
    return src_flat, mask_flat, pos_flat, spatial_shapes


class DeformableTransformerEncoderLayer(nn.Module):
    """Self-MSDeformAttn + FFN (``:520-563``)."""
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 padding_mask=None, deterministic: bool = True):
        # NB deterministic is positional (not kw-only) so nn.remat can mark
        # it static via static_argnums
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="self_attn")(
            with_pos(src, pos), reference_points, src, spatial_shapes,
            padding_mask)
        src = src + nn.Dropout(self.dropout)(src2,
                                             deterministic=deterministic)
        src = nn.LayerNorm(name="norm1", epsilon=1e-5)(src)
        return FFN(self.d_model, self.d_ffn, self.dropout, self.activation,
                   name="ffn")(src, deterministic=deterministic)


class DeformableTransformerDecoderLayer(nn.Module):
    """MHA self-attn + cross-MSDeformAttn + FFN (``:596-648``)."""
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask=None, *, deterministic: bool = True):
        q = with_pos(tgt, query_pos)
        tgt2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="self_attn")(
            q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2", epsilon=1e-5)(tgt)

        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="cross_attn")(
            with_pos(tgt, query_pos), reference_points, src, spatial_shapes,
            src_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1", epsilon=1e-5)(tgt)
        return FFN(self.d_model, self.d_ffn, self.dropout, self.activation,
                   name="ffn")(tgt, deterministic=deterministic)


class DepthFusionLayer(nn.Module):
    """Deformable cross-attention from a token stream onto depth tokens.

    Covers both the LateFusion layer (``DepthDeformableTransformerEncoderLayer``,
    ``:341-402``) and the Encoder-CF fusion layer
    (``DeformableTransformerFusionLayerV2``, ``:406-461``): depth_scale_adapt
    -> LayerNorm -> cross-MSDeformAttn -> cross_scale_adapt -> residual+LN ->
    single-linear GELU FFN.
    """
    d_model: int = 256
    dropout: float = 0.1
    n_levels: int = 1
    n_heads: int = 8
    n_points: int = 4
    ffn_activation: str = "gelu"

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src,
                 src_spatial_shapes, src_padding_mask=None,
                 *, deterministic: bool = True):
        src = dense(self.d_model, name="depth_scale_adapt")(src)
        src = nn.LayerNorm(name="norm_depth_scale", epsilon=1e-5)(src)
        # reference points may carry more levels than the depth stream; use
        # the first n_levels (single-level in every production config).
        ref = reference_points[:, :, :self.n_levels, :]
        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="cross_attn")(
            with_pos(tgt, query_pos), ref, src, src_spatial_shapes,
            src_padding_mask)
        tgt2 = dense(self.d_model, name="cross_scale_adapt")(tgt2)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1", epsilon=1e-5)(tgt)
        return SingleLinearFFN(self.d_model, self.dropout,
                               self.ffn_activation, name="ffn")(
            tgt, deterministic=deterministic)


def _class_bias_init(prior_prob: float = 0.01):
    bias_value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, bias_value, dtype)

    return init


def _bbox_tail_bias_init(wh_bias: float):
    """bbox MLP final bias: zeros for xy, ``wh_bias`` for wh
    (``deformable_detr_single.py:184,188,197``)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        b = np.zeros(shape, np.float32)
        b[2:] = wh_bias
        return jnp.asarray(b, dtype)

    return init


class DetectionHead(nn.Module):
    """Per-layer classification Dense + 3-layer box MLP."""
    d_model: int
    num_classes: int
    wh_bias: float = -2.0

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(self.num_classes, name="class_embed",
                          kernel_init=nn.initializers.xavier_uniform(),
                          bias_init=_class_bias_init())(x)
        # final MLP layer: zero kernel + custom bias so boxes start near the
        # reference point (reference init, ``deformable_detr_single.py:156-157``)
        h = x
        for i in range(2):
            h = jax.nn.relu(dense(self.d_model, name=f"bbox_layers_{i}")(h))
        deltas = nn.Dense(4, name="bbox_layers_2",
                          kernel_init=nn.initializers.zeros,
                          bias_init=_bbox_tail_bias_init(self.wh_bias))(h)
        return logits, deltas


def refine_reference(deltas, reference):
    """Iterative box refinement update (``:728-739``).

    2-coord refs grow into 4-coord boxes after the first refinement.
    """
    if reference.shape[-1] == 4:
        new_ref = jax.nn.sigmoid(deltas + inverse_sigmoid(reference))
    else:
        assert reference.shape[-1] == 2
        xy = deltas[..., :2] + inverse_sigmoid(reference)
        new_ref = jax.nn.sigmoid(
            jnp.concatenate([xy, deltas[..., 2:]], axis=-1))
    return jax.lax.stop_gradient(new_ref)


class DeformableTransformer(nn.Module):
    """Full trunk. Fusion adapters selected by ``fusion``:
    'none' | 'late' | 'encoder_cf'. (Backbone cross-fusion lives in the
    backbone, not here.)"""
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    two_stage: bool = False
    two_stage_num_proposals: int = 300
    with_box_refine: bool = False
    num_classes: int = 3
    fusion: str = "none"
    dpth_n_points: int = 4
    dpth_feature_levels: int = 1
    num_enc_fusion_layers: int = 4
    remat: bool = False   # jax.checkpoint the encoder layers (memory dial)

    def _heads(self):
        num_pred = (self.num_decoder_layers + 1 if self.two_stage
                    else self.num_decoder_layers)
        wh_bias = 0.0 if self.two_stage else -2.0
        if self.with_box_refine:
            heads = [DetectionHead(self.d_model, self.num_classes, wh_bias,
                                   name=f"head_{i}") for i in range(num_pred)]
        else:
            shared = DetectionHead(self.d_model, self.num_classes, wh_bias,
                                   name="head_shared")
            heads = [shared] * num_pred
        return heads

    @nn.compact
    def __call__(self, srcs, masks, pos_embeds, depth_srcs=None,
                 depth_masks=None, depth_pos_embeds=None, *,
                 deterministic: bool = True):
        """srcs/masks/pos_embeds: lists of (B,H,W,C)/(B,H,W)/(B,H,W,C).

        Returns dict: outputs_class (num_layers, B, Q, K), outputs_coord
        (num_layers, B, Q, 4), plus enc outputs when two-stage.
        """
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model))

        src_flat, mask_flat, pos_flat, spatial_shapes = flatten_levels(
            srcs, masks, pos_embeds, level_embed)
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)
        B, S, C = src_flat.shape
        heads = self._heads()

        ref_points_enc = encoder_reference_points(spatial_shapes,
                                                  valid_ratios)

        depth_flat = depth_mask_flat = depth_pos_flat = None
        depth_shapes = None
        if self.fusion in ("late", "encoder_cf"):
            assert depth_srcs is not None
            # depth has no level embedding (``:226``)
            depth_flat, depth_mask_flat, depth_pos_flat, depth_shapes = (
                flatten_levels(depth_srcs, depth_masks, depth_pos_embeds,
                               None))

        # ---- LateFusion: one depth cross-attn over RGB tokens (``:212-244``)
        if self.fusion == "late":
            fused = DepthFusionLayer(
                self.d_model, self.dropout, self.dpth_feature_levels,
                self.n_heads, self.dpth_n_points,
                name="depth_encoder_layer")(
                    src_flat, pos_flat, ref_points_enc, depth_flat,
                    depth_shapes, depth_mask_flat,
                    deterministic=deterministic)
            src_flat = src_flat + fused

        # ---- encoder (optionally with interleaved cross-fusion, ``:497-518``)
        # remat: recompute encoder-layer activations in the backward pass
        # (jax.checkpoint) — trades ~1 extra forward for O(layers) less
        # live activation memory, the standard TPU memory/FLOPs dial
        enc_layer_cls = (nn.remat(DeformableTransformerEncoderLayer,
                                  static_argnums=(4, 6))
                         if self.remat else DeformableTransformerEncoderLayer)
        output = src_flat
        output_fusion = depth_flat
        for i in range(self.num_encoder_layers):
            output = enc_layer_cls(
                self.d_model, self.dim_feedforward, self.dropout,
                self.activation, self.num_feature_levels, self.n_heads,
                self.enc_n_points, name=f"encoder_layers_{i}")(
                    output, pos_flat, ref_points_enc, spatial_shapes,
                    mask_flat, deterministic)
            if self.fusion == "encoder_cf" and i < self.num_enc_fusion_layers:
                # Reference semantics (``:497-518``): the fusion output
                # (RGB-token-shaped) becomes the next layer's depth source
                # AND the RGB padding mask is applied to it — both only
                # type-check because the production config is single-level
                # stride-16 where the RGB and depth grids coincide. With a
                # multi-level pyramid we condition every fusion layer on
                # the *original* depth tokens with the depth mask instead.
                same_tokens = (mask_flat.shape[1]
                               == depth_mask_flat.shape[1])
                src = output_fusion if same_tokens else depth_flat
                fusion_mask = mask_flat if same_tokens else depth_mask_flat
                fused = DepthFusionLayer(
                    self.d_model, self.dropout, len(depth_shapes),
                    self.n_heads, self.enc_n_points,
                    name=f"fusion_layers_{i}")(
                        output, pos_flat, ref_points_enc, src,
                        depth_shapes, fusion_mask,
                        deterministic=deterministic)
                if same_tokens:
                    output_fusion = fused
                output = output + fused
        memory = output

        # ---- decoder input (``:306-329``)
        enc_outputs_class = None
        enc_outputs_coord_unact = None
        if self.two_stage:
            output_memory, output_proposals = (
                self._gen_encoder_output_proposals(memory, mask_flat,
                                                   spatial_shapes))
            enc_logits, enc_deltas = heads[self.num_decoder_layers](
                output_memory)
            enc_outputs_class = enc_logits
            enc_outputs_coord_unact = enc_deltas + output_proposals

            topk = self.two_stage_num_proposals
            _, topk_idx = jax.lax.top_k(enc_outputs_class[..., 0], topk)
            topk_coords_unact = jnp.take_along_axis(
                enc_outputs_coord_unact, topk_idx[..., None], axis=1)
            topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)
            reference_points = jax.nn.sigmoid(topk_coords_unact)
            pos_trans_out = nn.LayerNorm(name="pos_trans_norm",
                                         epsilon=1e-5)(
                dense(self.d_model * 2, name="pos_trans")(
                    proposal_pos_embed(topk_coords_unact,
                                       self.d_model // 2)))
            query_pos, tgt = jnp.split(pos_trans_out, 2, axis=-1)
        else:
            query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0),
                (self.two_stage_num_proposals, self.d_model * 2))
            query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
            query_pos = jnp.broadcast_to(query_pos[None],
                                         (B, *query_pos.shape))
            tgt = jnp.broadcast_to(tgt[None], (B, *tgt.shape))
            reference_points = jax.nn.sigmoid(
                dense(2, name="reference_points")(query_pos))

        init_reference = reference_points

        # ---- decoder with iterative refinement (``:713-748``)
        outputs_classes = []
        outputs_coords = []
        output = tgt
        for lid in range(self.num_decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (reference_points[:, :, None]
                             * jnp.concatenate([valid_ratios, valid_ratios],
                                               axis=-1)[:, None])
            else:
                ref_input = (reference_points[:, :, None]
                             * valid_ratios[:, None])
            output = DeformableTransformerDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.activation, self.num_feature_levels, self.n_heads,
                self.dec_n_points, name=f"decoder_layers_{lid}")(
                    output, query_pos, ref_input, memory, spatial_shapes,
                    mask_flat, deterministic=deterministic)

            # per-layer outputs, computed against the layer's *input*
            # reference (parity with ``deformable_detr_single.py:330-345``)
            logits, deltas = heads[lid](output)
            ref_unact = inverse_sigmoid(reference_points)
            if reference_points.shape[-1] == 4:
                coord = jax.nn.sigmoid(deltas + ref_unact)
            else:
                xy = deltas[..., :2] + ref_unact
                coord = jax.nn.sigmoid(
                    jnp.concatenate([xy, deltas[..., 2:]], axis=-1))
            outputs_classes.append(logits)
            outputs_coords.append(coord)

            if self.with_box_refine:
                reference_points = refine_reference(deltas, reference_points)

        out = {
            "outputs_class": jnp.stack(outputs_classes),
            "outputs_coord": jnp.stack(outputs_coords),
            "init_reference": init_reference,
            "memory": memory,
            "mask_flat": mask_flat,
            "spatial_shapes": spatial_shapes,
            "valid_ratios": valid_ratios,
            "query_pos": query_pos,
            "pos_flat": pos_flat,
            "hs_last": output,
            # temporal-head inputs: the post-refinement reference
            # (``inter_references_out[-1]``) and the last layer's raw box
            # deltas (so QRF can recompute ``bbox_embed[-1](hs) +
            # inverse_sigmoid(last_reference)`` exactly,
            # ``deformable_transformer_multi_plusplus.py:476-480``)
            "last_reference": reference_points,
            "last_deltas": deltas,
        }
        if self.two_stage:
            out["enc_outputs_class"] = enc_outputs_class
            out["enc_outputs_coord"] = jax.nn.sigmoid(
                enc_outputs_coord_unact)
        return out

    def _gen_encoder_output_proposals(self, memory, mask_flat,
                                      spatial_shapes):
        """Two-stage proposal generation (``:123-153``)."""
        B, S, C = memory.shape
        proposals = []
        cur = 0
        for lvl, (H, W) in enumerate(spatial_shapes):
            mask_l = mask_flat[:, cur:cur + H * W].reshape(B, H, W)
            valid_h = jnp.sum((~mask_l[:, :, 0]).astype(jnp.float32), axis=1)
            valid_w = jnp.sum((~mask_l[:, 0, :]).astype(jnp.float32), axis=1)
            gy = jnp.broadcast_to(
                jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
            gx = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
            grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
            scale = jnp.stack([valid_w, valid_h], axis=-1)[:, None, None, :]
            grid = (grid[None] + 0.5) / scale
            wh = jnp.ones_like(grid) * 0.05 * (2.0 ** lvl)
            proposals.append(
                jnp.concatenate([grid, wh], axis=-1).reshape(B, -1, 4))
            cur += H * W
        output_proposals = jnp.concatenate(proposals, axis=1)
        valid = jnp.all((output_proposals > 0.01)
                        & (output_proposals < 0.99), axis=-1, keepdims=True)
        output_proposals = jnp.log(
            output_proposals / (1 - output_proposals))
        inf = jnp.asarray(jnp.inf, output_proposals.dtype)
        output_proposals = jnp.where(mask_flat[..., None], inf,
                                     output_proposals)
        output_proposals = jnp.where(~valid, inf, output_proposals)

        output_memory = jnp.where(mask_flat[..., None], 0.0, memory)
        output_memory = jnp.where(~valid, 0.0, output_memory)
        output_memory = nn.LayerNorm(name="enc_output_norm", epsilon=1e-5)(
            dense(self.d_model, name="enc_output")(output_memory))
        return output_memory, output_proposals
