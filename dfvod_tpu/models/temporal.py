"""Temporal heads — TransVOD and TransVOD++ video detection on top of the
single-frame trunk.

Parity targets:
- TransVOD:   ``models/deformable_transformer_multi.py:328-378`` (memory
  chunking, TQE with top-80/50/30*N ref-query selection, 1-layer temporal
  deformable decoder) + final head ``deformable_detr_multi.py:291-302``.
- TransVOD++: ``models/deformable_transformer_multi_plusplus.py:395-604``
  (QRF RoIAlign + SparseRCNN DynamicConv query enhancement, hand-class
  channel-1 top-k, three TQE+decoder rounds each emitting aux outputs) +
  final head ``deformable_detr_multi_plusplus.py:330-341``.

TPU-first re-design: the reference hard-codes batch = one clip (frames ride
the batch dim of a single sample). Here frames still ride the leading axis
— ``(B*F, H, W, C)`` with clips contiguous, ``F = 1 + num_ref_frames`` —
but every temporal op is written batched over B clips (reshape to
``(B, F, ...)``; no per-clip python loops), so clip-parallel sharding over
the mesh works for both B>1 training and clip-parallel inference.

Reference quirks kept (load-bearing for checkpoint parity):
- QRF RoIAlign uses ``spatial_scale=1/32`` even for DC5 stride-16 memory
  (``deformable_transformer_multi_plusplus.py:132``).
- Rounds 2/3 of TransVOD++ run their decoder from the *spatial* reference
  ``cur_reference_out``, not the previous round's output (``:571-578``).
- TransVOD's top-k indexes ``prob[..., :-1]`` flattened over (query,
  class) then integer-divides by K-1 (``deformable_transformer_multi.py:
  354-372``); TransVOD++ uses the hand-class channel 1 (``:539``).
- The temporal decoder gets no padding mask (``:375-376``: mask None).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.models.detr import DeformableDETR
from dfvod_tpu.models.layers import (
    FFN,
    MSDeformAttn,
    MultiHeadAttention,
    dense,
    with_pos,
)
from dfvod_tpu.models.transformer import (
    DeformableTransformerDecoderLayer,
    DetectionHead,
    inverse_sigmoid,
)
from dfvod_tpu.ops.roi_align import roi_align
from dfvod_tpu.utils.box_ops import box_cxcywh_to_xyxy
from dfvod_tpu.utils.config import ModelConfig


class TemporalQueryEncoderLayer(nn.Module):
    """Vanilla MHA self-attn + cross-attn onto selected reference queries
    (``deformable_transformer_multi.py:560-610``)."""
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_heads: int = 8

    @nn.compact
    def __call__(self, query, ref_query, query_pos=None, ref_query_pos=None,
                 *, deterministic: bool = True):
        q = with_pos(query, query_pos)
        tgt2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="self_attn")(
            q, q, query, deterministic=deterministic)
        tgt = query + nn.Dropout(self.dropout)(tgt2,
                                               deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2", epsilon=1e-5)(tgt)

        tgt2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="cross_attn")(
            with_pos(tgt, query_pos), with_pos(ref_query, ref_query_pos),
            ref_query, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1", epsilon=1e-5)(tgt)
        return FFN(self.d_model, self.d_ffn, self.dropout, "relu",
                   name="ffn")(tgt, deterministic=deterministic)


class TDAMLayer(nn.Module):
    """Temporal deformable memory aggregation: current-frame tokens
    self-attend then deformably cross-attend into the N reference frames'
    memories treated as N levels
    (``TemporalDeformableTransformerEncoderLayer``, ``:624-680``)."""
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    num_ref_frames: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src,
                 src_spatial_shapes, src_padding_mask=None,
                 *, deterministic: bool = True):
        q = with_pos(tgt, query_pos)
        tgt2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="self_attn")(
            q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2", epsilon=1e-5)(tgt)

        tgt2 = MSDeformAttn(self.d_model, self.num_ref_frames, self.n_heads,
                            self.n_points, name="cross_attn")(
            with_pos(tgt, query_pos), reference_points, src,
            src_spatial_shapes, src_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1", epsilon=1e-5)(tgt)
        return FFN(self.d_model, self.d_ffn, self.dropout, "relu",
                   name="ffn")(tgt, deterministic=deterministic)


class DynamicConv(nn.Module):
    """SparseRCNN dynamic instance interaction
    (``models/sparse_roi_head/head.py:127-172``): per-query generated
    (C->64) and (64->C) kernels bmm'd with the 49 roi tokens, then a
    flatten+linear to one vector per query."""
    hidden_dim: int = 256
    dim_dynamic: int = 64
    num_dynamic: int = 2
    pooler_resolution: int = 7

    @nn.compact
    def __call__(self, pro_features, roi_features):
        """pro_features: (B, R, C); roi_features: (B, R, P*P, C)."""
        num_params = self.hidden_dim * self.dim_dynamic
        params = dense(self.num_dynamic * num_params,
                       name="dynamic_layer")(pro_features)
        p1 = params[..., :num_params].reshape(
            *pro_features.shape[:2], self.hidden_dim, self.dim_dynamic)
        p2 = params[..., num_params:].reshape(
            *pro_features.shape[:2], self.dim_dynamic, self.hidden_dim)

        feats = jnp.einsum("brpc,brcd->brpd", roi_features, p1)
        feats = nn.LayerNorm(name="norm1", epsilon=1e-5)(feats)
        feats = jax.nn.relu(feats)
        feats = jnp.einsum("brpd,brdc->brpc", feats, p2)
        feats = nn.LayerNorm(name="norm2", epsilon=1e-5)(feats)
        feats = jax.nn.relu(feats)

        feats = feats.reshape(*feats.shape[:2], -1)   # (B, R, P*P*C)
        feats = dense(self.hidden_dim, name="out_layer")(feats)
        feats = nn.LayerNorm(name="norm3", epsilon=1e-5)(feats)
        return jax.nn.relu(feats)


class RCNNHead(nn.Module):
    """QRF head: query self-attn -> DynamicConv with roi features -> FFN
    (``models/sparse_roi_head/head.py:31-83``). SparseRCNN config:
    nheads 8, dropout 0.0, ffn 2048 (``deformable_transformer_multi_
    plusplus.py:137-139``)."""
    d_model: int = 256
    dim_feedforward: int = 2048
    n_heads: int = 8
    dropout: float = 0.0
    pooler_resolution: int = 7

    @nn.compact
    def __call__(self, roi_features, pro_features, *,
                 deterministic: bool = True):
        """roi_features: (B, R, P, P, C); pro_features: (B, R, C)."""
        B, R = pro_features.shape[:2]
        roi = roi_features.reshape(B, R, -1, self.d_model)

        pro2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name="self_attn")(
            pro_features, pro_features, pro_features,
            deterministic=deterministic)
        pro = pro_features + nn.Dropout(self.dropout)(
            pro2, deterministic=deterministic)
        pro = nn.LayerNorm(name="norm1", epsilon=1e-5)(pro)

        pro2 = DynamicConv(self.d_model,
                           pooler_resolution=self.pooler_resolution,
                           name="inst_interact")(pro, roi)
        pro = pro + nn.Dropout(self.dropout)(pro2,
                                             deterministic=deterministic)
        obj = nn.LayerNorm(name="norm2", epsilon=1e-5)(pro)

        obj2 = dense(self.d_model, name="linear2")(
            nn.Dropout(self.dropout)(
                jax.nn.relu(dense(self.dim_feedforward, name="linear1")(obj)),
                deterministic=deterministic))
        obj = obj + nn.Dropout(self.dropout)(obj2,
                                             deterministic=deterministic)
        return nn.LayerNorm(name="norm3", epsilon=1e-5)(obj)


class TemporalDecoder(nn.Module):
    """n-layer deformable decoder over the current frame's memory; no box
    refinement (``TemporalDeformableTransformerDecoder``, bbox_embed
    hard-set None, ``deformable_transformer_multi.py:809-860``)."""
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    num_layers: int = 1
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, tgt, reference_points, src, spatial_shapes,
                 valid_ratios, query_pos=None, src_padding_mask=None,
                 *, deterministic: bool = True):
        output = tgt
        for lid in range(self.num_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (reference_points[:, :, None]
                             * jnp.concatenate([valid_ratios, valid_ratios],
                                               -1)[:, None])
            else:
                ref_input = (reference_points[:, :, None]
                             * valid_ratios[:, None])
            output = DeformableTransformerDecoderLayer(
                self.d_model, self.d_ffn, self.dropout, "relu",
                1, self.n_heads, self.n_points,
                name=f"layers_{lid}")(
                    output, query_pos, ref_input, src, spatial_shapes,
                    src_padding_mask, deterministic=deterministic)
        return output, reference_points


def _topk_queries(ref_hs, scores, k: int):
    """Gather the k highest-scoring reference queries.
    ref_hs: (B, NQ, C); scores: (B, NQ). Returns (B, k, C)."""
    _, idx = jax.lax.top_k(scores, k)
    return jnp.take_along_axis(ref_hs, idx[..., None], axis=1)


class TemporalDeformableDETR(nn.Module):
    """TransVOD / TransVOD++ model: single-frame trunk over all frames,
    temporal aggregation producing key-frame outputs.

    Input: images ``(B*F, H, W, C)`` with clips contiguous
    (frame order per clip: [key, ref_1, ..., ref_N]); mask ``(B*F, H, W)``.
    Output dict has key-frame predictions ``(B, Q, ...)``.
    """
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_dim
        self.detr = DeformableDETR(cfg, name="detr")
        self.temporal_query_layer1 = TemporalQueryEncoderLayer(
            d, cfg.dim_feedforward, cfg.dropout, cfg.nheads,
            name="temporal_query_layer1")
        self.temporal_query_layer2 = TemporalQueryEncoderLayer(
            d, cfg.dim_feedforward, cfg.dropout, cfg.nheads,
            name="temporal_query_layer2")
        self.temporal_query_layer3 = TemporalQueryEncoderLayer(
            d, cfg.dim_feedforward, cfg.dropout, cfg.nheads,
            name="temporal_query_layer3")
        if cfg.temporal_mode == "transvod":
            if cfg.use_tdam:
                self.temporal_encoder_layer = TDAMLayer(
                    d, cfg.dim_feedforward, cfg.dropout, cfg.num_ref_frames,
                    cfg.nheads, name="temporal_encoder_layer")
            self.temporal_decoder = TemporalDecoder(
                d, cfg.dim_feedforward, cfg.dropout,
                cfg.n_temporal_decoder_layers, cfg.nheads, cfg.dec_n_points,
                name="temporal_decoder")
            self.temp_head = DetectionHead(d, cfg.num_classes,
                                           name="temp_head")
        else:  # transvod_pp
            # the reference builds the QRF head with the TRANSFORMER's ffn
            # width / heads / dropout, not SparseRCNN's 2048 defaults
            # (``deformable_transformer_multi_plusplus.py:155``: RCNNHead(
            # cfg, d_model, num_classes, dim_feedforward, nhead, dropout))
            self.qrf_head = RCNNHead(d, cfg.dim_feedforward, cfg.nheads,
                                     cfg.dropout, name="qrf_dynamic_layer1")
            self.temporal_decoders = [
                TemporalDecoder(d, cfg.dim_feedforward, cfg.dropout,
                                cfg.n_temporal_decoder_layers, cfg.nheads,
                                cfg.dec_n_points,
                                name=f"temporal_decoder{i + 1}")
                for i in range(3)]
            self.temp_heads = [DetectionHead(d, cfg.num_classes,
                                             name=f"temp_head_{i}")
                               for i in range(3)]

    def __call__(self, images, mask, *, train: bool = False):
        from dfvod_tpu.models.detr import _matmul_precision
        with _matmul_precision(self.cfg.compute_dtype):
            return self._forward(images, mask, train=train)

    def _forward(self, images, mask, *, train: bool = False):
        cfg = self.cfg
        F = 1 + cfg.num_ref_frames
        BF = images.shape[0]
        assert BF % F == 0, (BF, F)
        B = BF // F
        deterministic = not train

        out_sf = self.detr(images, mask, train=train)
        trunk = out_sf["_trunk"]

        def split(x):
            """(B*F, ...) -> key (B, ...), refs (B, N, ...)."""
            x = x.reshape(B, F, *x.shape[1:])
            return x[:, 0], x[:, 1:]

        if cfg.fixed_pretrained_model:
            sg = jax.lax.stop_gradient
            # spatial_shapes is STATIC metadata (a Python int tuple) — a
            # tree_map'd stop_gradient would turn it into traced scalars
            # and break the int() shape math downstream
            trunk = {**jax.tree_util.tree_map(
                sg, {k: v for k, v in trunk.items()
                     if k != "spatial_shapes"}),
                "spatial_shapes": trunk["spatial_shapes"]}
            out_sf = {**out_sf,
                      "pred_logits": sg(out_sf["pred_logits"]),
                      "pred_boxes": sg(out_sf["pred_boxes"])}

        memory = trunk["memory"]                 # (BF, S, C)
        pos_flat = trunk["pos_flat"]
        hs = trunk["hs_last"]                    # (BF, Q, C)
        last_ref = trunk["last_reference"]       # (BF, Q, 2|4)
        spatial_shapes = trunk["spatial_shapes"]
        N, Q = cfg.num_ref_frames, hs.shape[1]
        S = memory.shape[1]

        cur_memory, ref_memory = split(memory)
        cur_pos, ref_pos = split(pos_flat)
        ref_memory = (ref_memory + ref_pos).reshape(B, N * S, -1)
        cur_hs, ref_hs = split(hs)
        ref_hs = ref_hs.reshape(B, N * Q, -1)
        cur_ref, ref_refs = split(last_ref)
        cur_valid_ratios = split(trunk["valid_ratios"])[0]  # (B, L, 2)

        # per-frame logits of the trunk's last head (== class_embed[-1](hs))
        logits_last = out_sf["pred_logits"]
        _, ref_logits = split(logits_last)
        ref_logits = ref_logits.reshape(B, N * Q, -1)
        ref_prob = jax.nn.sigmoid(ref_logits)

        if cfg.temporal_mode == "transvod":
            return self._transvod(
                out_sf, cur_memory, cur_pos, ref_memory, cur_hs, ref_hs,
                ref_prob, cur_ref, spatial_shapes, cur_valid_ratios, B,
                deterministic)
        return self._transvod_pp(
            out_sf, trunk, cur_memory, ref_memory, cur_hs, ref_hs,
            ref_prob, cur_ref, ref_refs, spatial_shapes, cur_valid_ratios,
            mask, B, deterministic)

    # ------------------------------------------------------------------
    def _transvod(self, out_sf, cur_memory, cur_pos, ref_memory, cur_hs,
                  ref_hs, ref_prob, cur_ref, spatial_shapes, valid_ratios,
                  B, deterministic):
        """``deformable_transformer_multi.py:328-378``."""
        cfg = self.cfg
        N = cfg.num_ref_frames
        K = ref_prob.shape[-1]

        if cfg.use_tdam:
            ref_shapes = tuple(spatial_shapes[:1]) * N
            vr = jnp.broadcast_to(valid_ratios[:, :1], (B, N, 2))
            ref_points = _grid_reference_points(spatial_shapes, vr)
            # key-frame pos embedding rides the TDAM queries
            # (``cur_pos_embed``, ``deformable_transformer_multi.py:342``)
            cur_memory = self.temporal_encoder_layer(
                cur_memory, cur_pos, ref_points, ref_memory, ref_shapes,
                deterministic=deterministic)

        # top-k over (query, class<K-1) pairs, index // (K-1) -> query id
        # (``:354-372``)
        flat = ref_prob[..., :K - 1].reshape(B, -1)
        for layer, k_mult in ((self.temporal_query_layer1, 80),
                              (self.temporal_query_layer2, 50),
                              (self.temporal_query_layer3, 30)):
            # clamp for small-Q configs (reference assumes Q=300 >= 80)
            _, idx = jax.lax.top_k(flat, min(k_mult * N, flat.shape[1]))
            qidx = idx // (K - 1)
            sel = jnp.take_along_axis(ref_hs, qidx[..., None], axis=1)
            cur_hs = layer(cur_hs, sel, deterministic=deterministic)

        final_hs, final_ref = self.temporal_decoder(
            cur_hs, cur_ref, cur_memory, spatial_shapes[:1],
            valid_ratios[:, :1], None, None, deterministic=deterministic)

        logits, deltas = self.temp_head(final_hs)
        coord = _apply_box_head(deltas, final_ref)
        out = {"pred_logits": logits, "pred_boxes": coord}
        # key-frame slices of the single-frame outputs, for inspection /
        # optional aux supervision (reference returns but does not use them)
        out["_single_frame"] = _key_frame_outputs(out_sf, B,
                                                  1 + cfg.num_ref_frames)
        return out

    # ------------------------------------------------------------------
    def _transvod_pp(self, out_sf, trunk, cur_memory, ref_memory, cur_hs,
                     ref_hs, ref_prob, cur_ref, ref_refs, spatial_shapes,
                     valid_ratios, mask, B, deterministic):
        """``deformable_transformer_multi_plusplus.py:395-604``."""
        cfg = self.cfg
        N = cfg.num_ref_frames
        F = 1 + N
        Q = cur_hs.shape[1]
        d = cfg.hidden_dim
        # full-resolution size comes from the padding mask, never from the
        # image tensor: a packed-s2d input is (H/2, W/2) and would halve
        # whwh, silently shrinking every RoI (advisor finding r1)
        img_h, img_w = mask.shape[1], mask.shape[2]
        whwh = jnp.array([img_w, img_h, img_w, img_h], jnp.float32)

        # ---- QRF: boxes from bbox_embed[-1](hs) + inv_sig(last_reference)
        # (``:476-480``), roi-align each frame's memory, DynamicConv fuse
        hs_all = trunk["hs_last"]                    # (BF, Q, C)
        deltas = trunk["last_deltas"]                # (BF, Q, 4)
        ref_unact = inverse_sigmoid(trunk["last_reference"])
        boxes = jax.nn.sigmoid(deltas + ref_unact)   # (BF, Q, 4) cxcywh
        boxes_xyxy = box_cxcywh_to_xyxy(boxes) * whwh

        H1, W1 = int(spatial_shapes[0][0]), int(spatial_shapes[0][1])
        mem_maps_all = trunk["memory"][:, :H1 * W1].reshape(-1, H1, W1, d)
        # reference frames carry their positional embedding (``:417-422``)
        pos_maps = trunk["pos_flat"][:, :H1 * W1].reshape(-1, H1, W1, d)
        frame_is_ref = (jnp.arange(B * F) % F) != 0
        mem_maps = jnp.where(frame_is_ref[:, None, None, None],
                             mem_maps_all + pos_maps, mem_maps_all)

        rois = roi_align(mem_maps, boxes_xyxy, output_size=7,
                         spatial_scale=1 / 32, sampling_ratio=2)
        hs_enh = self.qrf_head(rois, hs_all, deterministic=deterministic)

        cur_hs = hs_enh.reshape(B, F, Q, d)[:, 0]
        ref_hs = hs_enh.reshape(B, F, Q, d)[:, 1:].reshape(B, N * Q, d)

        # ---- 3 rounds of (top-k channel-1 select -> TQE -> temporal
        # decoder -> head); decoder reference stays the spatial
        # ``cur_ref`` every round (``:571-578`` quirk)
        hand_prob = ref_prob[..., 1]                 # (B, N*Q)
        aux = []
        final_logits = final_coord = None
        rounds = ((self.temporal_query_layer1, self.temporal_decoders[0],
                   self.temp_heads[0], 80),
                  (self.temporal_query_layer2, self.temporal_decoders[1],
                   self.temp_heads[1], 50),
                  (self.temporal_query_layer3, self.temporal_decoders[2],
                   self.temp_heads[2], 30))
        for i, (tqe, decoder, head, k_mult) in enumerate(rounds):
            sel = _topk_queries(ref_hs, hand_prob,
                                min(k_mult * N, hand_prob.shape[1]))
            cur_hs = tqe(cur_hs, sel, deterministic=deterministic)
            cur_hs, round_ref = decoder(
                cur_hs, cur_ref, cur_memory, spatial_shapes[:1],
                valid_ratios[:, :1], None, None,
                deterministic=deterministic)
            logits, ds = head(cur_hs)
            coord = _apply_box_head(ds, round_ref)
            if i < 2:
                aux.append({"pred_logits": logits, "pred_boxes": coord})
            else:
                final_logits, final_coord = logits, coord

        out = {"pred_logits": final_logits, "pred_boxes": final_coord,
               "aux_outputs": aux}
        out["_single_frame"] = _key_frame_outputs(out_sf, B, F)
        return out


def _apply_box_head(deltas, reference):
    """``tmp += inverse_sigmoid(reference); sigmoid``
    (``deformable_detr_multi.py:291-302``)."""
    ref = inverse_sigmoid(reference)
    if ref.shape[-1] == 4:
        return jax.nn.sigmoid(deltas + ref)
    xy = deltas[..., :2] + ref
    return jax.nn.sigmoid(jnp.concatenate([xy, deltas[..., 2:]], -1))


def _key_frame_outputs(out_sf, B, F):
    take = lambda x: x.reshape(B, F, *x.shape[1:])[:, 0]   # noqa: E731
    out = {"pred_logits": take(out_sf["pred_logits"]),
           "pred_boxes": take(out_sf["pred_boxes"])}
    if "enc_outputs" in out_sf:  # two_stage: keep the key frame's encoder
        out["enc_outputs"] = {    # proposals available for enc losses
            k: take(v) for k, v in out_sf["enc_outputs"].items()}
    return out


def _grid_reference_points(spatial_shapes, valid_ratios):
    """Reference points of the current frame's single level, broadcast over
    the N ref-frame 'levels' (``get_reference_points`` with expanded
    valid_ratios, ``deformable_transformer_multi.py:344-351``)."""
    H, W = int(spatial_shapes[0][0]), int(spatial_shapes[0][1])
    ys = (np.arange(H, dtype=np.float32) + 0.5)
    xs = (np.arange(W, dtype=np.float32) + 0.5)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    ref = jnp.asarray(np.stack([xx.reshape(-1), yy.reshape(-1)], -1))
    ref = ref / jnp.array([W, H], jnp.float32)
    B, L = valid_ratios.shape[:2]
    ref = ref[None, :, None, :] / valid_ratios[:, None]   # (B, S, L, 2)
    return ref * valid_ratios[:, None]
