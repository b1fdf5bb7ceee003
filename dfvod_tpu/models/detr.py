"""DeformableDETR — the single-frame RGB-D detection model.

Assembles backbone(s) -> input projections -> deformable transformer ->
per-layer detection outputs. Parity target:
``models/deformable_detr_single.py:44-362`` with the fusion routing of its
``build()`` (``:621-679``):

- Baseline              : ResNet-50 RGB only
- LateFusion            : ResNet-50 + DFormer depth stem; one depth
                          cross-attn before the encoder
- Backbone_CrossFusion  : CrossFusionBackbone (fusion between conv stages)
- Encoder_CrossFusion   : ResNet-50 + DFormer; fusion layers interleaved in
                          the encoder

Inputs are channels-last ``(B, H, W, 4)`` RGB-D (or 3-ch RGB) with a
``(B, H, W)`` padding mask; static shapes come from the resize buckets in
the data pipeline.
"""
from __future__ import annotations

import flax.linen as nn
import jax

from dfvod_tpu.models.backbone_crossfusion import CrossFusionBackbone
from dfvod_tpu.models.backbone_dformer import DFormerBackbone
from dfvod_tpu.models.backbone_resnet import ResNet50, downsample_mask
from dfvod_tpu.models.position_encoding import (
    sine_position_embedding_rect as sine_position_embedding,
)
from dfvod_tpu.models.transformer import DeformableTransformer
from dfvod_tpu.utils.config import ModelConfig


def _matmul_precision(compute_dtype: str):
    """``compute_dtype='bfloat16'`` runs every matmul/conv with bf16 MXU
    passes while keeping params/activations f32 in memory — measured 1.5x
    on v5e with <=1e-1 logit drift; 'float32' keeps the platform default."""
    import contextlib
    if compute_dtype == "bfloat16":
        return jax.default_matmul_precision("bfloat16")
    return contextlib.nullcontext()


class InputProj(nn.Module):
    """1x1 conv + GroupNorm(32) level projection
    (``deformable_detr_single.py:101-150``)."""
    d_model: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.d_model, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=True,
                    name="conv", kernel_init=nn.initializers.xavier_uniform(),
                    bias_init=nn.initializers.zeros)(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)


class DeformableDETR(nn.Module):
    """Single-frame model; returns the reference's output dict."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_dim
        fusion = cfg.fusion_type

        if fusion == "Backbone_CrossFusion":
            self.backbone = CrossFusionBackbone(
                d_model=d, dilation=cfg.dilation,
                return_stages=cfg.backbone_stages,
                dropout=cfg.dropout, name="backbone")
        else:
            self.backbone = ResNet50(dilation=cfg.dilation,
                                     return_stages=cfg.all_backbone_stages,
                                     name="backbone")
            if fusion in ("LateFusion", "Encoder_CrossFusion"):
                if cfg.depth_backbone_type == "resnet18":
                    from dfvod_tpu.models.research import (
                        ResNet18DepthBackbone,
                    )
                    self.depth_backbone = ResNet18DepthBackbone(
                        name="depth_backbone")
                else:
                    self.depth_backbone = DFormerBackbone(
                        name="depth_backbone")

        n_stages = len(cfg.backbone_stages)
        projs = []
        for i, stage in enumerate(cfg.backbone_stages):
            projs.append(InputProj(d, name=f"input_proj_{i}"))
        # extra pyramid levels from the last stage via 3x3 s2 conv
        for i in range(n_stages, cfg.num_feature_levels):
            projs.append(InputProj(d, kernel=3, stride=2,
                                   name=f"input_proj_{i}"))
        self.input_proj = projs

        if fusion in ("LateFusion", "Encoder_CrossFusion"):
            self.input_proj_depth = InputProj(d, name="input_proj_depth_0")

        if cfg.masks:
            from dfvod_tpu.models.segmentation import MaskBranch
            self.mask_branch = MaskBranch(hidden_dim=d, num_heads=cfg.nheads,
                                          name="mask_branch")

        self.transformer = DeformableTransformer(
            d_model=d, n_heads=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points,
            enc_n_points=cfg.enc_n_points,
            two_stage=cfg.two_stage,
            two_stage_num_proposals=cfg.num_queries,
            with_box_refine=cfg.with_box_refine,
            num_classes=cfg.num_classes,
            fusion=cfg.transformer_fusion,
            dpth_n_points=cfg.dpth_n_points,
            remat=cfg.remat,
            name="transformer")

    def __call__(self, images, mask, *, train: bool = False):
        """images: (B,H,W,3|4), or the host-packed s2d form
        (B,H/2,W/2,12|16) from ``data.device_pipeline.pack_s2d``;
        mask: (B,H,W) bool True=pad (always full resolution)."""
        with _matmul_precision(self.cfg.compute_dtype):
            return self._forward(images, mask, train=train)

    def _forward(self, images, mask, *, train: bool = False):
        cfg = self.cfg
        deterministic = not train
        packed = images.shape[-1] in (12, 16)
        if packed:
            assert cfg.fusion_type != "Backbone_CrossFusion" and \
                cfg.depth_backbone_type != "resnet18", \
                "s2d-packed input needs the s2d stems (ResNet50/DFormer)"
        if cfg.use_depth:
            if packed:
                assert images.shape[-1] == 16, \
                    "packed RGB-D input must have 16 channels"
                rgb, depth = images[..., :12], images[..., 12:16]
            else:
                assert images.shape[-1] == 4, \
                    "RGB-D input must have 4 channels"
                rgb, depth = images[..., :3], images[..., 3:4]
        else:
            rgb, depth = images[..., :12 if packed else 3], None

        depth_feats = depth_masks = None
        stage_outs = None
        if cfg.fusion_type == "Backbone_CrossFusion":
            feats, feat_masks, dfeat, dmask = self.backbone(
                rgb, depth, mask, train=train, deterministic=deterministic)
        else:
            stage_outs = self.backbone(rgb, train=train)
            feats = [stage_outs[s] for s in cfg.backbone_stages]
            feat_masks = [downsample_mask(mask, f.shape[1:3])
                          for f in feats]
            if cfg.fusion_type in ("LateFusion", "Encoder_CrossFusion"):
                dfeat, dmask = self.depth_backbone(depth, mask, train=train)
                depth_feats = [self.input_proj_depth(dfeat)]
                depth_masks = [dmask]

        srcs = [proj(f) for proj, f in
                zip(self.input_proj[:len(feats)], feats)]
        masks = list(feat_masks)
        # extra feature levels from the last backbone stage (``:271-281``)
        for i in range(len(feats), cfg.num_feature_levels):
            src = self.input_proj[i](feats[-1] if i == len(feats)
                                     else srcs[-1])
            srcs.append(src)
            masks.append(downsample_mask(mask, src.shape[1:3]))

        pos = [sine_position_embedding(~m, cfg.hidden_dim // 2)
               for m in masks]
        depth_pos = None
        if depth_feats is not None:
            depth_pos = [sine_position_embedding(~m, cfg.hidden_dim // 2)
                         for m in depth_masks]

        t_out = self.transformer(
            srcs, masks, pos, depth_feats, depth_masks, depth_pos,
            deterministic=deterministic)

        out = {
            "pred_logits": t_out["outputs_class"][-1],
            "pred_boxes": t_out["outputs_coord"][-1],
        }
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_boxes": b}
                for c, b in zip(t_out["outputs_class"][:-1],
                                t_out["outputs_coord"][:-1])]
        if cfg.two_stage:
            out["enc_outputs"] = {
                "pred_logits": t_out["enc_outputs_class"],
                "pred_boxes": t_out["enc_outputs_coord"],
            }
        if cfg.masks:
            # DETRsegm mask branch (``segmentation.py:30-169`` /
            # ``deformable_detr_single.py:680-681``) on the trunk: per-
            # query attention over the level-0 memory map, FPN-upsampled
            # through backbone layers 3 -> 2 -> 1
            H1, W1 = (int(t_out["spatial_shapes"][0][0]),
                      int(t_out["spatial_shapes"][0][1]))
            d = cfg.hidden_dim
            mem_map = t_out["memory"][:, :H1 * W1].reshape(
                -1, H1, W1, d)
            laterals = [stage_outs[3], stage_outs[2], stage_outs[1]]
            out["pred_masks"] = self.mask_branch(
                t_out["hs_last"], mem_map, masks[0], laterals)
        # expose trunk state for temporal heads / debugging
        out["_trunk"] = {k: t_out[k] for k in
                         ("memory", "mask_flat", "spatial_shapes",
                          "valid_ratios", "query_pos", "pos_flat",
                          "hs_last", "init_reference", "last_reference",
                          "last_deltas")}
        return out
