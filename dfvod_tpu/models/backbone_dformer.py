"""DFormer depth backbone — the 1-channel downsample path.

Parity with the reference ``models/dformer_backbone.py:18-159``:
stem = Conv3x3 s2 -> BN -> GELU -> Conv3x3 s2 -> BN (dims[0]=32), then per
stage BN -> Conv3x3 s2. Only the first three stages run (output stride 16,
128 channels); stage weights come from a DFormer checkpoint via the
converter in ``utils/checkpoint.py``.

BatchNorm here is *trainable* (the reference builds with
``freeze_batchnorm=False``, ``dformer_backbone.py:261``); batch statistics
live in the ``batch_stats`` collection and are updated when
``use_running_average=False``.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from dfvod_tpu.models.backbone_resnet import downsample_mask


def _bn(features: int, name: str) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax: 0.9)
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name)


def _conv(features: int, stride: int, name: str) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=True, name=name,
                   kernel_init=nn.initializers.xavier_uniform(),
                   bias_init=nn.initializers.zeros)


class DFormerDownsamplePath(nn.Module):
    """Depth feature extractor; returns the stride-16 feature map.

    ``dims``: per-stage channel dims; stages beyond ``num_stages`` are not
    instantiated (the reference builds a 4th stage but never runs it,
    ``dformer_backbone.py:142``).
    """
    dims: Sequence[int] = (32, 64, 128)
    gelu_exact: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, H, W, 1) depth. Returns (B, H/16, W/16, dims[-1])."""
        d0 = self.dims[0]
        # stem (stride 4)
        x = _conv(d0 // 2, 2, "stem_conv1")(x)
        x = _bn(d0 // 2, "stem_bn1")(x, use_running_average=not train)
        x = jax.nn.gelu(x, approximate=not self.gelu_exact)
        x = _conv(d0, 2, "stem_conv2")(x)
        x = _bn(d0, "stem_bn2")(x, use_running_average=not train)
        # downsample stages
        for i in range(len(self.dims) - 1):
            x = _bn(self.dims[i], f"stage{i + 1}_bn")(
                x, use_running_average=not train)
            x = _conv(self.dims[i + 1], 2, f"stage{i + 1}_conv")(x)
        return x


class DFormerBackbone(nn.Module):
    """Depth backbone producing a single stride-16 level + its mask."""
    dims: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, depth, mask, *, train: bool = False):
        feat = DFormerDownsamplePath(self.dims, name="downsample_path")(
            depth, train=train)
        feat_mask = downsample_mask(mask, feat.shape[1:3])
        return feat, feat_mask
