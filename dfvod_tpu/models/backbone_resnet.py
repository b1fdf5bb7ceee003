"""ResNet backbone with FrozenBatchNorm — channels-last, XLA-fused.

Functional parity with the reference RGB backbone
(``models/backbone_scratch.py:31-141``: torchvision ResNet-50 with
FrozenBatchNorm2d, stage-by-stage forward so fusion hooks can be inserted,
DC5 dilation on the last stage) re-expressed NHWC for TPU conv layouts.

FrozenBN buffers live in the ``constants`` variable collection, so they are
untouched by any optimizer over ``params`` — the functional equivalent of
requires_grad=False buffers.

Convolutions use explicit torch-style padding (not 'SAME') so that converted
torchvision checkpoints reproduce reference activations exactly.

``Bottleneck``/``ResNetStage`` are setup-style (explicit param
declaration) so a stage can read its children's raw weights, fold the
FrozenBN affine in, and dispatch the whole stage to the fused Pallas
bottleneck kernel (``ops/fused_bottleneck.py``) in bf16 serving on TPU.
The parameter tree (``layer1/block_0/conv1/kernel`` etc.) is unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BN with fixed statistics and affine params (``backbone_scratch.py:31-68``)."""
    features: int
    eps: float = 1e-5

    def setup(self):
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        self.weight = self.variable("constants", "weight", ones, None,
                                    (self.features,), jnp.float32)
        self.bias = self.variable("constants", "bias", zeros, None,
                                  (self.features,), jnp.float32)
        self.running_mean = self.variable("constants", "running_mean",
                                          zeros, None, (self.features,),
                                          jnp.float32)
        self.running_var = self.variable("constants", "running_var", ones,
                                         None, (self.features,),
                                         jnp.float32)

    def fold(self):
        """(scale, bias) of the equivalent affine map, in the stored
        dtype (f32, or bf16 after a serving-mode cast)."""
        w, b = self.weight.value, self.bias.value
        rm, rv = self.running_mean.value, self.running_var.value
        scale = w * jax.lax.rsqrt(rv + self.eps)
        return scale, b - rm * scale

    def __call__(self, x):
        scale, bias = self.fold()
        scale = scale.astype(x.dtype)
        bias = bias.astype(x.dtype)
        return x * scale[None, None, None, :] + bias[None, None, None, :]


def conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
         name: Optional[str] = None, use_bias: bool = False) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation),
                   use_bias=use_bias, name=name,
                   kernel_init=nn.initializers.he_normal())


class TorchConv(nn.Module):
    """Bias-free conv with torch-style explicit padding and an exposed
    ``weight`` (setup-style, so parents can read it without a call).
    Same param name/shape as ``nn.Conv`` ("kernel", HWIO)."""
    in_features: int
    features: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1

    def setup(self):
        self.weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32)

    def __call__(self, x):
        pad = self.dilation * (self.kernel - 1) // 2
        w = self.weight
        dt = jnp.promote_types(x.dtype, w.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    """torchvision Bottleneck block (1x1 -> 3x3 -> 1x1, expansion 4)."""
    in_features: int
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: Callable = FrozenBatchNorm

    def setup(self):
        p = self.planes
        self.conv1 = TorchConv(self.in_features, p, 1)
        self.bn1 = self.norm(p)
        self.conv2 = TorchConv(p, p, 3, self.stride, self.dilation)
        self.bn2 = self.norm(p)
        self.conv3 = TorchConv(p, p * 4, 1)
        self.bn3 = self.norm(p * 4)
        if self.downsample:
            self.downsample_conv = TorchConv(self.in_features, p * 4, 1,
                                             self.stride)
            self.downsample_bn = self.norm(p * 4)

    def __call__(self, x):
        from dfvod_tpu.ops import quant
        if quant.enabled() and self.norm is FrozenBatchNorm:
            return self._int8_call(x)
        identity = x
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = jax.nn.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample:
            identity = self.downsample_bn(self.downsample_conv(x))
        return jax.nn.relu(out + identity)

    def _int8_call(self, x):
        """W8A8 serving path (``ops/quant.py``): FrozenBN folded into the
        conv weights, per-output-channel int8 weight scales, dynamic
        per-tensor activation scales, int32 MXU accumulation. Semantics
        identical to the f32 path up to quantization error (bounded by
        the parity test in ``tests/test_quant.py``).

        Each conv self-describes with a ``conv{K}x{K}_c{Cin}`` seam tag
        so a seam allowlist (``quant.set_mode(seams=...)``) can quantize
        only the shapes the round-5 micros showed int8 wins on; untagged
        convs fall back to the bf16 conv + FrozenBN path."""
        from dfvod_tpu.ops import quant

        def qcv(inp, cv, bn, stride=1, dilation=1):
            tag = f"conv{cv.kernel}x{cv.kernel}_c{inp.shape[-1]}"
            if not quant.enabled(tag):
                return bn(cv(inp))
            s, b = bn.fold()
            w = cv.weight.astype(jnp.float32) * s
            pad = dilation * (cv.kernel - 1) // 2
            y = quant.conv_int8(inp, w, (stride, stride),
                                ((pad, pad), (pad, pad)),
                                (dilation, dilation))
            return y + b.astype(y.dtype)

        identity = x
        out = jax.nn.relu(qcv(x, self.conv1, self.bn1))
        out = jax.nn.relu(qcv(out, self.conv2, self.bn2, self.stride,
                              self.dilation))
        out = qcv(out, self.conv3, self.bn3)
        if self.downsample:
            identity = qcv(x, self.downsample_conv, self.downsample_bn,
                           self.stride)
        return jax.nn.relu(out + identity)

    def folded_weights(self, dtype):
        """(w1, b1, w2, b2, w3, b3, wd, bd) with FrozenBN folded in;
        weights in ``dtype`` (matmul layouts), biases f32."""
        def fold(cv, bn, squeeze):
            s, b = bn.fold()
            w = cv.weight.astype(jnp.float32) * s
            if squeeze:
                w = w[0, 0]
            return w.astype(dtype), b.astype(jnp.float32)

        w1, b1 = fold(self.conv1, self.bn1, True)
        w2, b2 = fold(self.conv2, self.bn2, False)
        w3, b3 = fold(self.conv3, self.bn3, True)
        if self.downsample:
            wd, bd = fold(self.downsample_conv, self.downsample_bn, True)
        else:
            wd = bd = None
        return (w1, b1, w2, b2, w3, b3, wd, bd)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dilate: bool = False
    norm: Callable = FrozenBatchNorm
    in_features: Optional[int] = None  # torchvision default wiring
    allow_fused: bool = True

    def _in_features(self) -> int:
        if self.in_features is not None:
            return self.in_features
        # torchvision: layer1 reads the 64-ch stem, layerN reads the
        # previous stage's planes*2 (= this stage's planes*2)
        return 64 if self.planes == 64 else self.planes * 2

    def setup(self):
        # torchvision replace_stride_with_dilation: the stage keeps stride 1
        # and later blocks dilate; the first block uses the *previous*
        # dilation (=1 for layer4 in DC5 ResNet-50).
        stride = 1 if self.dilate else self.stride
        dil = self.stride if self.dilate else 1
        for i in range(self.blocks):
            if i == 0:
                blk = Bottleneck(self._in_features(), self.planes, stride,
                                 1, downsample=True, norm=self.norm)
            else:
                blk = Bottleneck(self.planes * 4, self.planes, 1, dil,
                                 norm=self.norm)
            setattr(self, f"block_{i}", blk)

    def __call__(self, x, *, train: bool = False):
        blocks = [getattr(self, f"block_{i}") for i in range(self.blocks)]
        if (self.allow_fused and not train and self.stride == 1
                and not self.dilate and self.norm is FrozenBatchNorm):
            from dfvod_tpu.ops import fused_bottleneck as fb
            if fb.supported(x, self.blocks):
                return fb.fused_bottleneck_stage(
                    x, [b.folded_weights(x.dtype) for b in blocks])
        for b in blocks:
            x = b(x)
        return x


def max_pool_torch(x, window: int, stride: int, pad: int):
    """Torch-style max pool with explicit symmetric padding."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


class StemConvS2D(nn.Module):
    """conv1 (7x7 stride-2 pad-3 on 3 channels) reparameterized via 2x2
    space-to-depth — the classic TPU stem transform (MLPerf ResNet): a
    stride-2 conv on a 3-channel 608x800 image keeps the MXU contraction
    dim at 7*7*3 with pathological memory access; the SAME multiply-adds
    as a stride-1 4x4 conv over the (H/2, W/2, 12) space-to-depth input
    run 3.2x faster (2.50 -> 0.79 ms at B=8).

    Exact reparameterization, not an approximation: output pixel (i, j)
    needs x[2i-3+a, 2j-3+b]; writing a-3 = 2m+dy maps each original tap
    (a, b) to block offset (m, n) in [-2, 1] and intra-block (dy, dx) —
    a 4x4 kernel over blocks with asymmetric padding (2, 1). The stored
    parameter keeps the reference layout (7, 7, 3, 64)
    (``backbone_scratch.py:104-118`` / torchvision conv1), so checkpoint
    conversion and the torch-parity tests are untouched; the 4x4x12
    kernel is derived from it inside the forward (a trace-time constant
    shuffle of 9.4k weights).
    """
    features: int = 64

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3), or the host-packed s2d form
        (B, H/2, W/2, 12) from ``data.device_pipeline.pack_s2d`` —
        identical values, rearranged on host where it costs a uint8
        memcpy instead of on-device relayout copies."""
        w = self.param("kernel", nn.initializers.he_normal(),
                       (7, 7, 3, self.features), jnp.float32)
        w = w.astype(x.dtype)
        B, H, W, C = x.shape
        packed = C == 12
        if packed:
            C = 3
        w2 = jnp.zeros((4, 4, 4 * C, self.features), x.dtype)
        for m in range(4):
            for dy in range(2):
                a = 2 * m + dy - 1
                if not 0 <= a <= 6:
                    continue
                for n in range(4):
                    for dx in range(2):
                        b = 2 * n + dx - 1
                        if not 0 <= b <= 6:
                            continue
                        blk = (dy * 2 + dx) * C
                        w2 = w2.at[m, n, blk:blk + C].set(w[a, b])
        if packed:
            x2 = x
        else:
            x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet50(nn.Module):
    """ResNet-50 trunk returning the requested stage outputs.

    ``return_stages``: subset of (1, 2, 3, 4). DC5 (``dilation=True``)
    replaces layer4's stride with dilation (stride 32 -> 16).
    """
    dilation: bool = False
    return_stages: Sequence[int] = (4,)
    norm: Callable = FrozenBatchNorm
    stem_s2d: bool = True  # exact space-to-depth conv1 (see StemConvS2D)
    # Fused Pallas bottleneck stage (ops/fused_bottleneck.py): measured
    # SLOWER in-model on the 2026-08 toolchain (layer1 at B=8 608x800:
    # backbone 8.1 -> 9.9 ms; the scoped-VMEM stack forces 8-row tiles
    # -> 1.75x halo recompute, and C=64 caps the MXU at ~25% either
    # way). Kept opt-in with parity tests; see PERF.md.
    fused_stages: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = {}
        H, W = x.shape[1], x.shape[2]
        if x.shape[-1] == 12:  # host-packed s2d input (pack_s2d)
            x = StemConvS2D(name="conv1")(x)
        elif self.stem_s2d and H % 2 == 0 and W % 2 == 0:
            x = StemConvS2D(name="conv1")(x)
        else:
            x = conv(64, 7, 2, name="conv1")(x)
        x = self.norm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        x = ResNetStage(64, 3, 1, norm=self.norm,
                        allow_fused=self.fused_stages,
                        name="layer1")(x, train=train)
        if 1 in self.return_stages:
            outs[1] = x
        x = ResNetStage(128, 4, 2, norm=self.norm,
                        name="layer2")(x, train=train)
        if 2 in self.return_stages:
            outs[2] = x
        x = ResNetStage(256, 6, 2, norm=self.norm,
                        name="layer3")(x, train=train)
        if 3 in self.return_stages:
            outs[3] = x
        x = ResNetStage(512, 3, 2, dilate=self.dilation, norm=self.norm,
                        name="layer4")(x, train=train)
        if 4 in self.return_stages:
            outs[4] = x
        return outs


RESNET50_STAGE_CHANNELS = {1: 256, 2: 512, 3: 1024, 4: 2048}


def resnet50_strides(dilation: bool, return_stages: Sequence[int]):
    strides = {1: 4, 2: 8, 3: 16, 4: 16 if dilation else 32}
    return [strides[s] for s in return_stages]


def downsample_mask(mask, shape: Tuple[int, int]):
    """Nearest-resize a (B, H, W) bool padding mask to a feature shape.

    Matches ``F.interpolate(mask[None].float(), size=...).bool()`` used
    throughout the reference backbones.
    """
    B, H, W = mask.shape
    # torch nearest maps output index i -> floor(i * in/out); NOT the
    # center-based rule jax.image.resize uses — the two pick different
    # rows at stride boundaries, which shifts valid_ratio and broke
    # full-model parity on padded images (test_full_model_parity)
    ri = (jnp.arange(shape[0]) * H) // shape[0]
    ci = (jnp.arange(shape[1]) * W) // shape[1]
    return mask[:, ri][:, :, ci]
