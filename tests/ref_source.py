"""Import the reference's ACTUAL source as the torch parity oracle.

``tests/torch_ref.py`` is a hand re-typed replica of the reference's
model math — faithful as far as anyone checked, but a shared misreading
would pass parity silently (VERDICT r2, Missing #2). This module instead
imports the reference's own executable files from ``/root/reference``
(``models/deformable_transformer_single.py``,
``deformable_detr_single.py``, the ``multi_plusplus`` pair, backbones)
so the oracle *is* the reference.

Two gaps keep those files from importing as-is on this image, closed by
shims installed in ``sys.modules`` before the import:

- ``MultiScaleDeformableAttention`` — the compiled CUDA pybind module
  (``models/ops/src/vision.cpp:13-16``). The stub's
  ``ms_deform_attn_forward`` routes to the reference's OWN pure-torch
  math ``ms_deform_attn_core_pytorch``
  (``models/ops/functions/ms_deform_attn_func.py:41-61``), so the
  kernel semantics in the oracle come from reference code, not ours.
- ``torchvision`` / ``mmcv`` — absent in this image. The fakes provide
  exactly what the reference touches: a torchvision-compatible
  Bottleneck ResNet-50 (same attribute tree, so state_dict keys match
  ``backbone.0.body.layer3.5.conv2.weight``-style reference names,
  with ``replace_stride_with_dilation``/``norm_layer`` kwargs as used
  at ``models/backbone_scratch.py:157-159``), an
  ``IntermediateLayerGetter``, ``ops.misc.interpolate``, and an
  ``mmcv.ops.RoIAlign`` wrapping the already-tested
  ``tests/torch_ref.torch_roi_align`` (aligned=True, sampling_ratio=2
  — ``deformable_transformer_multi_plusplus.py:129-132``). The ResNet
  here is plain standard torch (weights are synced through the
  converter on both sides, so only the module tree matters).

Nothing from ``/root/reference`` is copied; it is imported.
"""
from __future__ import annotations

import sys
import types
from argparse import Namespace
from collections import OrderedDict

import torch
import torch.nn.functional as F
from torch import nn

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# sys.modules shims
# ---------------------------------------------------------------------------

def _install_msda_stub():
    if "MultiScaleDeformableAttention" in sys.modules:
        return
    mod = types.ModuleType("MultiScaleDeformableAttention")

    def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                               sampling_locations, attention_weights,
                               im2col_step):
        # the reference's own grid_sample math is the kernel
        # (ms_deform_attn_func.py:41-61); lazy import avoids the cycle
        # (that file does `import MultiScaleDeformableAttention` at top).
        from models.ops.functions.ms_deform_attn_func import (
            ms_deform_attn_core_pytorch,
        )
        # Executable-CUDA truncation semantics: the multi++ temporal
        # decoder passes sampling locations whose level dim is
        # num_ref_frames (valid_ratios is rebound at
        # deformable_transformer_multi_plusplus.py:425 and reused at
        # :539/:566/:593) while spatial_shapes has 1 level. The CUDA
        # kernel derives strides from num_levels=spatial_shapes.size(0),
        # so on GPU it reads only the l=0 slice of the oversized tensor.
        # Reproduce that here (core_pytorch would shape-error instead).
        L = spatial_shapes.shape[0]
        if sampling_locations.shape[3] != L:
            assert sampling_locations.shape[3] > L
            sampling_locations = sampling_locations[:, :, :, :L]
        return ms_deform_attn_core_pytorch(
            value, spatial_shapes, sampling_locations, attention_weights)

    def ms_deform_attn_backward(*a, **k):  # pragma: no cover
        raise NotImplementedError(
            "reference-source oracle is forward/eval only")

    mod.ms_deform_attn_forward = ms_deform_attn_forward
    mod.ms_deform_attn_backward = ms_deform_attn_backward
    sys.modules["MultiScaleDeformableAttention"] = mod


# --- minimal torchvision-compatible ResNet (standard Bottleneck v1) -------

def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


def _conv3x3(cin, cout, stride=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     dilation=dilation, bias=False)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, stride, dilation)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class _ResNet(nn.Module):
    def __init__(self, layers, norm_layer=nn.BatchNorm2d,
                 replace_stride_with_dilation=None, num_classes=1000):
        super().__init__()
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self._norm_layer = norm_layer
        self.inplanes, self.dilation = 64, 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2,
                                       replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], 2,
                                       replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], 2,
                                       replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * _Bottleneck.expansion, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        norm_layer, downsample = self._norm_layer, None
        prev_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * _Bottleneck.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * _Bottleneck.expansion,
                         stride),
                norm_layer(planes * _Bottleneck.expansion))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              prev_dilation, norm_layer)]
        self.inplanes = planes * _Bottleneck.expansion
        layers += [_Bottleneck(self.inplanes, planes,
                               dilation=self.dilation, norm_layer=norm_layer)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):  # pragma: no cover - backbones call stages directly
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


class _IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter behavior."""

    def __init__(self, model, return_layers):
        orig = {str(k): str(v) for k, v in return_layers.items()}
        remaining = dict(orig)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            remaining.pop(name, None)
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.9.0"  # >=0.7: util/misc.py uses ops.misc.interpolate

    models = types.ModuleType("torchvision.models")

    def resnet50(pretrained=False, progress=True, norm_layer=None,
                 replace_stride_with_dilation=None, **kw):
        return _ResNet([3, 4, 6, 3],
                       norm_layer=norm_layer or nn.BatchNorm2d,
                       replace_stride_with_dilation=(
                           replace_stride_with_dilation))

    def resnet18(*a, **k):  # research_scripts only; never built in tests
        raise NotImplementedError("resnet18 not provided by the test shim")

    models.resnet50 = resnet50
    models.resnet18 = resnet18
    mutils = types.ModuleType("torchvision.models._utils")
    mutils.IntermediateLayerGetter = _IntermediateLayerGetter
    models._utils = mutils

    ops = types.ModuleType("torchvision.ops")
    ops_misc = types.ModuleType("torchvision.ops.misc")

    def interpolate(input, size=None, scale_factor=None, mode="nearest",
                    align_corners=None):
        return F.interpolate(input, size, scale_factor, mode, align_corners)

    ops_misc.interpolate = interpolate
    ops_boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        # util/box_ops.py:14 import; standard (x2-x1)*(y2-y1)
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    ops_boxes.box_area = box_area
    ops.misc, ops.boxes = ops_misc, ops_boxes
    tv.models, tv.ops = models, ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = mutils
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = ops_misc
    sys.modules["torchvision.ops.boxes"] = ops_boxes


class _RoIAlign(nn.Module):
    """mmcv.ops.RoIAlign(output_size, spatial_scale, sampling_ratio),
    aligned=True — via tests/torch_ref.torch_roi_align."""

    def __init__(self, output_size=7, spatial_scale=1.0, sampling_ratio=2,
                 **kw):
        super().__init__()
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def forward(self, feat, rois):
        from torch_ref import torch_roi_align
        out = []
        for r in rois:
            b = int(r[0].item())
            out.append(torch_roi_align(
                feat[b], r[None, 1:5], P=self.output_size,
                scale=self.spatial_scale, sr=self.sampling_ratio))
        return torch.cat(out, 0)


def _install_mmcv_stub():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    ops = types.ModuleType("mmcv.ops")
    ops.RoIAlign = _RoIAlign
    mmcv.ops = ops
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.ops"] = ops


def load_reference_modules():
    """Install the shims, put /root/reference on sys.path, and return the
    imported reference ``models`` package (executing the reference's own
    __init__/model files)."""
    _install_msda_stub()
    _install_torchvision_stub()
    _install_mmcv_stub()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models  # noqa: F401  (the reference package)
    assert models.__file__.startswith(REF_ROOT), models.__file__
    return models


# ---------------------------------------------------------------------------
# builder: reference model from a flag namespace (main.py:31-194 defaults)
# ---------------------------------------------------------------------------

def reference_args(**overrides) -> Namespace:
    """The subset of main.py flags the model builders read, at the
    reference defaults (main.py:31-194)."""
    args = Namespace(
        dataset_file="vid_single", device="cpu", num_classes=3,
        backbone="resnet50", dilation=False, position_embedding="sine",
        lr_backbone=2e-5, masks=False, frozen_weights=None,
        num_feature_levels=1, hidden_dim=256, nheads=8, enc_layers=6,
        dec_layers=6, dim_feedforward=1024, dropout=0.1, num_queries=300,
        dec_n_points=4, enc_n_points=4, dpth_n_points=4,
        two_stage=False, with_box_refine=False, aux_loss=True,
        use_depth=False, fusion_type="Baseline", depth_type="Baseline_rgb",
        dformer_backbone=True, dformer_weights="",
        set_cost_class=2, set_cost_bbox=5, set_cost_giou=2,
        cls_loss_coef=2, bbox_loss_coef=5, giou_loss_coef=2,
        mask_loss_coef=1, dice_loss_coef=1, focal_alpha=0.25,
        num_ref_frames=3, fixed_pretrained_model=False,
        n_temporal_decoder_layers=1,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build_reference_model(args: Namespace):
    """models/__init__.py:16-24 dispatch, executed from the reference."""
    models = load_reference_modules()
    model, criterion, postprocessors = models.build_model(args)
    return model.eval(), criterion, postprocessors


def perturb_(model: nn.Module, seed: int = 0, scale: float = 0.02):
    """Seeded perturbation of every param + BN statistic so parity can't
    pass on degenerate (zero/identity) tensors."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)
        for name, b in model.named_buffers():
            if b.dtype.is_floating_point and b.ndim >= 1:
                if name.endswith("running_var"):
                    b.copy_(1.0 + 0.5 * torch.rand(b.shape, generator=g))
                elif name.endswith("running_mean"):
                    b.copy_(torch.randn(b.shape, generator=g) * 0.1)
    return model
