"""Backbone Cross-Fusion: ResNet-50 RGB x DFormer depth, fused per stage.

Parity target: ``models/dformer_crossfusion_backbone.py:430-561`` — the two
backbones run in lockstep and, after RGB stages 2/3/4 (paired with depth
stem/stage1/stage2), both streams are 1x1-projected to d_model=256
(+GroupNorm), RGB tokens deformable-cross-attend onto depth tokens
(``d2r_fusion``), the result is projected back and added residually to the
RGB stream. The optional bidirectional ``r2d_fusion`` mirrors the update
onto the depth stream (``_2way`` research variant).

Deviation from the reference (documented): the reference sizes its fusion
projections with ``model_num_channels[rgb][layer - 2]``
(``dformer_crossfusion_backbone.py:246``), which is off by one versus the
channels actually produced in its forward pass (512/1024/2048 after
layers 2/3/4) and would fail at runtime; we use the channel mapping of its
working research-script sibling (``research_scripts/crossfusion_backbone.py:
128-160, 336-400``): each stage fuses with that stage's true output width.

Reference points for the cross-attention are the RGB pixel-center grid
scaled by the *depth* stream's valid ratio (``fuse_layers``,
``dformer_crossfusion_backbone.py:388-428``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from dfvod_tpu.models.backbone_dformer import _bn, _conv
from dfvod_tpu.models.backbone_resnet import (
    FrozenBatchNorm,
    ResNetStage,
    conv,
    downsample_mask,
    max_pool_torch,
)
from dfvod_tpu.models.position_encoding import (
    sine_position_embedding_rect as sine_position_embedding,
)
from dfvod_tpu.models.transformer import (
    DepthFusionLayer,
    encoder_reference_points,
    get_valid_ratio,
)


class _ProjGN(nn.Module):
    """1x1 conv + GroupNorm projection used around each fusion site."""
    features: int
    groups: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=True, name="conv",
                    kernel_init=nn.initializers.xavier_uniform(),
                    bias_init=nn.initializers.zeros)(x)
        return nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                            name="gn")(x)


class CrossFusionBackbone(nn.Module):
    """RGB ResNet-50 + DFormer depth with per-stage deformable fusion.

    Returns ``(rgb_feats, rgb_masks, depth_feat, depth_mask)`` where
    ``rgb_feats`` contains the stages in ``return_stages`` (channels-last).
    """
    d_model: int = 256
    dilation: bool = True
    return_stages: Sequence[int] = (4,)
    fusion_stages: Sequence[int] = (2, 3, 4)
    bidirectional: bool = False
    n_heads: int = 8
    fusion_n_points: int = 4
    dropout: float = 0.1
    depth_dims: Sequence[int] = (32, 64, 128)

    def _fuse(self, x_rgb, x_d, mask_rgb, mask_d, stage: int,
              deterministic: bool):
        """One fusion site: project -> cross-attend -> project back."""
        B, Hr, Wr, Cr = x_rgb.shape
        _, Hd, Wd, Cd = x_d.shape
        # depth input-proj GroupNorm group counts follow the reference
        # (``dformer_crossfusion_backbone.py:252``): {2: 4, 3: 8, 4: 16}
        d_groups = {2: 4, 3: 8, 4: 16}[stage]

        src_rgb = _ProjGN(self.d_model, 32, name=f"input_rgb_proj{stage}")(
            x_rgb)
        src_d = _ProjGN(self.d_model, d_groups,
                        name=f"input_d_proj{stage}")(x_d)

        pos_rgb = sine_position_embedding(~mask_rgb, self.d_model // 2)
        pos_d = sine_position_embedding(~mask_d, self.d_model // 2)

        rgb_tokens = src_rgb.reshape(B, Hr * Wr, self.d_model)
        d_tokens = src_d.reshape(B, Hd * Wd, self.d_model)
        pos_rgb_t = pos_rgb.reshape(B, Hr * Wr, self.d_model)
        pos_d_t = pos_d.reshape(B, Hd * Wd, self.d_model)
        mask_d_t = mask_d.reshape(B, Hd * Wd)
        mask_rgb_t = mask_rgb.reshape(B, Hr * Wr)

        vr_d = get_valid_ratio(mask_d)[:, None, :]   # (B, 1, 2)
        ref_rgb = encoder_reference_points(((Hr, Wr),), vr_d)

        fused = DepthFusionLayer(
            self.d_model, self.dropout, 1, self.n_heads,
            self.fusion_n_points, ffn_activation="relu",
            name=f"d2r_fusion{stage}")(
                rgb_tokens, pos_rgb_t, ref_rgb, d_tokens, ((Hd, Wd),),
                mask_d_t, deterministic=deterministic)
        fused = fused.reshape(B, Hr, Wr, self.d_model)
        fused = _ProjGN(Cr, 32, name=f"output_rgb_proj{stage}")(fused)
        x_rgb = x_rgb + fused

        if self.bidirectional:
            vr_rgb = get_valid_ratio(mask_rgb)[:, None, :]
            ref_d = encoder_reference_points(((Hd, Wd),), vr_rgb)
            fused_d = DepthFusionLayer(
                self.d_model, self.dropout, 1, self.n_heads,
                self.fusion_n_points, ffn_activation="relu",
                name=f"r2d_fusion{stage}")(
                    d_tokens, pos_d_t, ref_d, rgb_tokens, ((Hr, Wr),),
                    mask_rgb_t, deterministic=deterministic)
            fused_d = fused_d.reshape(B, Hd, Wd, self.d_model)
            fused_d = _ProjGN(Cd, d_groups,
                              name=f"output_d_proj{stage}")(fused_d)
            x_d = x_d + fused_d
        return x_rgb, x_d

    @nn.compact
    def __call__(self, rgb, depth, mask, *, train: bool = False,
                 deterministic: bool = True):
        """rgb: (B,H,W,3); depth: (B,H,W,1); mask: (B,H,W) True=pad."""
        norm = FrozenBatchNorm
        d0 = self.depth_dims[0]

        # RGB stem + layer1/2; depth stem — in lockstep
        x = conv(64, 7, 2, name="conv1")(rgb)
        x = norm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        x = ResNetStage(64, 3, 1, name="layer1")(x, train=train)
        x_rgb = ResNetStage(128, 4, 2, name="layer2")(x, train=train)

        x_d = _conv(d0 // 2, 2, "stem_conv1")(depth)
        x_d = _bn(d0 // 2, "stem_bn1")(x_d, use_running_average=not train)
        x_d = jax.nn.gelu(x_d, approximate=False)
        x_d = _conv(d0, 2, "stem_conv2")(x_d)
        x_d = _bn(d0, "stem_bn2")(x_d, use_running_average=not train)

        outs = {}
        masks = {}
        mask_rgb = downsample_mask(mask, x_rgb.shape[1:3])
        mask_d = downsample_mask(mask, x_d.shape[1:3])
        if 2 in self.fusion_stages:
            x_rgb, x_d = self._fuse(x_rgb, x_d, mask_rgb, mask_d, 2,
                                    deterministic)
        if 2 in self.return_stages:
            outs[2], masks[2] = x_rgb, mask_rgb

        x_rgb = ResNetStage(256, 6, 2, name="layer3")(x_rgb, train=train)
        x_d = _bn(self.depth_dims[0], "stage1_bn")(
            x_d, use_running_average=not train)
        x_d = _conv(self.depth_dims[1], 2, "stage1_conv")(x_d)
        mask_rgb = downsample_mask(mask, x_rgb.shape[1:3])
        mask_d = downsample_mask(mask, x_d.shape[1:3])
        if 3 in self.fusion_stages:
            x_rgb, x_d = self._fuse(x_rgb, x_d, mask_rgb, mask_d, 3,
                                    deterministic)
        if 3 in self.return_stages:
            outs[3], masks[3] = x_rgb, mask_rgb

        x_rgb = ResNetStage(512, 3, 2, dilate=self.dilation,
                            name="layer4")(x_rgb, train=train)
        x_d = _bn(self.depth_dims[1], "stage2_bn")(
            x_d, use_running_average=not train)
        x_d = _conv(self.depth_dims[2], 2, "stage2_conv")(x_d)
        mask_rgb = downsample_mask(mask, x_rgb.shape[1:3])
        mask_d = downsample_mask(mask, x_d.shape[1:3])
        if 4 in self.fusion_stages:
            x_rgb, x_d = self._fuse(x_rgb, x_d, mask_rgb, mask_d, 4,
                                    deterministic)
        outs[4], masks[4] = x_rgb, mask_rgb

        rgb_feats = [outs[s] for s in self.return_stages]
        rgb_masks = [masks[s] for s in self.return_stages]
        return rgb_feats, rgb_masks, x_d, mask_d
