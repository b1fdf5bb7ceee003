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
import jax.numpy as jnp

from dfvod_tpu.models.backbone_resnet import downsample_mask


def _bn(features: int, name: str) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax: 0.9)
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name)


def _conv(features: int, stride: int, name: str) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=True, name=name,
                   kernel_init=nn.initializers.xavier_uniform(),
                   bias_init=nn.initializers.zeros)


class Conv3x3S2D(nn.Module):
    """3x3 stride-2 pad-1 conv reparameterized via 2x2 space-to-depth —
    the same exact transform as the ResNet stem's ``StemConvS2D``
    (``backbone_resnet.py``) applied to the DFormer stem's small-channel
    convs (``dformer_backbone.py:18-60`` stride-2 3x3 on 1- then
    16-channel inputs), whose 9- and 144-wide MXU contraction dims tile
    poorly at full 608x800 resolution.

    Output pixel (i, j) reads x[2i-1+a, 2j-1+b]; a-1 = 2m+dy maps each
    tap to block offset m in {-1, 0} and intra-block dy, giving a 2x2
    stride-1 kernel over the (H/2, W/2, 4C) s2d input with asymmetric
    (1, 0) padding. Parameters keep the reference (3, 3, C, F) layout +
    bias so checkpoint conversion and param trees are unchanged; the
    (2, 2, 4C, F) kernel is a trace-time constant shuffle.
    """
    features: int
    in_channels: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, in_channels), or the host-packed s2d form
        (B, H/2, W/2, 4*in_channels) (``data.device_pipeline.pack_s2d``)."""
        w = self.param("kernel", nn.initializers.xavier_uniform(),
                       (3, 3, self.in_channels, self.features),
                       jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        w = w.astype(x.dtype)
        B, H, W, C = x.shape
        packed = C == 4 * self.in_channels
        if packed:
            C = self.in_channels
        w2 = jnp.zeros((2, 2, 4 * C, self.features), x.dtype)
        for m in (-1, 0):
            for dy in range(2):
                a = 2 * m + dy + 1
                if not 0 <= a <= 2:
                    continue
                for n in (-1, 0):
                    for dx in range(2):
                        b = 2 * n + dx + 1
                        if not 0 <= b <= 2:
                            continue
                        blk = (dy * 2 + dx) * C
                        w2 = w2.at[m + 1, n + 1, blk:blk + C].set(w[a, b])
        if packed:
            x2 = x
        else:
            x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H // 2, W // 2, 4 * C)
        y = jax.lax.conv_general_dilated(
            x2, w2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(x.dtype)


class DFormerDownsamplePath(nn.Module):
    """Depth feature extractor; returns the stride-16 feature map.

    ``dims``: per-stage channel dims; stages beyond ``num_stages`` are not
    instantiated (the reference builds a 4th stage but never runs it,
    ``dformer_backbone.py:142``).
    """
    dims: Sequence[int] = (32, 64, 128)
    gelu_exact: bool = True
    # exact space-to-depth stem (see Conv3x3S2D) — measured neutral on
    # the v5e (PERF.md 'Tried and rejected'), kept opt-in
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, H, W, 1) depth, or the host-packed s2d form
        (B, H/2, W/2, 4). Returns (B, H/16, W/16, dims[-1])."""
        d0 = self.dims[0]

        def stem_conv(inp, feats, in_ch, name):
            h, w = inp.shape[1], inp.shape[2]
            if inp.shape[-1] == 4 * in_ch:  # host-packed s2d input
                return Conv3x3S2D(feats, in_ch, name=name)(inp)
            if self.stem_s2d and h % 2 == 0 and w % 2 == 0:
                return Conv3x3S2D(feats, in_ch, name=name)(inp)
            return _conv(feats, 2, name)(inp)

        # stem (stride 4)
        x = stem_conv(x, d0 // 2, 1, "stem_conv1")
        x = _bn(d0 // 2, "stem_bn1")(x, use_running_average=not train)
        x = jax.nn.gelu(x, approximate=not self.gelu_exact)
        x = stem_conv(x, d0, d0 // 2, "stem_conv2")
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
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, depth, mask, *, train: bool = False):
        feat = DFormerDownsamplePath(self.dims, stem_s2d=self.stem_s2d,
                                     name="downsample_path")(
            depth, train=train)
        feat_mask = downsample_mask(mask, feat.shape[1:3])
        return feat, feat_mask
