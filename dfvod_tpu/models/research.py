"""Research-variant backbones — equivalents of
``models/research_scripts/`` (kept by the reference as fallback builders
when the DFormer flags are off, ``deformable_detr_single.py:653,661``).

``ResNet18DepthBackbone`` mirrors ``research_scripts/depth_backbone.py``:
a ResNet-18 (BasicBlock) trunk over the depth channel returning the
stride-16 ``layer3`` feature (256 channels, ``depth_backbone.py:75-77``).
The reference's R50+R18 cross-fusion research backbone
(``crossfusion_backbone.py``) is architecturally subsumed by
``CrossFusionBackbone`` (same per-stage deformable fusion with the DFormer
depth trunk the final models use).

Select via ``ModelConfig.depth_backbone_type = "resnet18"``.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax

from dfvod_tpu.models.backbone_resnet import (
    FrozenBatchNorm,
    conv,
    downsample_mask,
    max_pool_torch,
)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (3x3 -> 3x3, expansion 1)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: Callable = FrozenBatchNorm

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.planes, 3, self.stride, name="conv1")(x)
        out = self.norm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = conv(self.planes, 3, name="conv2")(out)
        out = self.norm(self.planes, name="bn2")(out)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride,
                            name="downsample_conv")(x)
            identity = self.norm(self.planes, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNet18Stage(nn.Module):
    planes: int
    blocks: int = 2
    stride: int = 1
    norm: Callable = FrozenBatchNorm

    @nn.compact
    def __call__(self, x):
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlock(self.planes, self.stride, downsample=needs_ds,
                       norm=self.norm, name="block_0")(x)
        for i in range(1, self.blocks):
            x = BasicBlock(self.planes, norm=self.norm,
                           name=f"block_{i}")(x)
        return x


class ResNet18DepthBackbone(nn.Module):
    """Depth trunk: 1-channel stem + layers 1-3, stride-16 / 256-ch output
    (``research_scripts/depth_backbone.py:59-91`` single-level contract)."""
    norm: Callable = FrozenBatchNorm

    @nn.compact
    def __call__(self, depth, mask, *, train: bool = False):
        x = conv(64, 7, 2, name="conv1")(depth)
        x = self.norm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        x = ResNet18Stage(64, 2, 1, norm=self.norm, name="layer1")(x)
        x = ResNet18Stage(128, 2, 2, norm=self.norm, name="layer2")(x)
        x = ResNet18Stage(256, 2, 2, norm=self.norm, name="layer3")(x)
        return x, downsample_mask(mask, x.shape[1:3])
