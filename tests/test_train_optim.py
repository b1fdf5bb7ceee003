"""Tests for optimizer param-group policies + checkpoint key surgery.

Mirrors the reference's per-fusion-type param groups (``main.py:292-435``)
and checkpoint surgery (``main.py:470-512``, ``main_multi.py:342-364``).
"""
import numpy as np
import pytest

from dfvod_tpu.train.optim import param_group_label
from dfvod_tpu.utils import checkpoint as ckpt


class TestParamGroupLabel:
    def test_baseline(self):
        lab = lambda *p: param_group_label(p, "Baseline")  # noqa: E731
        assert lab("backbone", "layer1", "block_0", "conv1",
                   "kernel") == "backbone"
        assert lab("transformer", "encoder_layers_0", "self_attn",
                   "sampling_offsets", "kernel") == "linear_proj"
        assert lab("transformer", "reference_points",
                   "kernel") == "linear_proj"
        assert lab("transformer", "head_0", "class_embed",
                   "kernel") == "base"

    def test_latefusion(self):
        lab = lambda *p: param_group_label(p, "LateFusion")  # noqa: E731
        # RGB backbone frozen (``main.py:312-315``)
        assert lab("backbone", "conv1", "kernel") == "frozen"
        # depth backbone trains at full lr (``main.py:323-326``)
        assert lab("depth_backbone", "downsample_path", "stem_conv1",
                   "kernel") == "base"
        # depth encoder layer 10x (``main.py:332-335``)
        assert lab("transformer", "depth_encoder_layer", "cross_attn",
                   "value_proj", "kernel") == "fusion10x"
        # ... except its linear-proj leaves, which stay at 1x
        assert lab("transformer", "depth_encoder_layer", "cross_attn",
                   "sampling_offsets", "kernel") == "base"
        assert lab("transformer", "encoder_layers_0", "self_attn",
                   "sampling_offsets", "kernel") == "linear_proj"

    def test_crossfusion(self):
        lab = lambda *p: param_group_label(  # noqa: E731
            p, "Backbone_CrossFusion")
        assert lab("backbone", "layer2", "block_0", "conv1",
                   "kernel") == "base"
        assert lab("backbone", "d2r_fusion2", "cross_attn", "value_proj",
                   "kernel") == "fusion10x"
        assert lab("backbone", "input_rgb_proj2", "conv",
                   "kernel") == "fusion10x"
        assert lab("backbone", "d2r_fusion2", "cross_attn",
                   "sampling_offsets", "kernel") == "base"

    def test_encoder_cf(self):
        lab = lambda *p: param_group_label(  # noqa: E731
            p, "Encoder_CrossFusion")
        assert lab("backbone", "conv1", "kernel") == "frozen"
        assert lab("transformer", "fusion_layers_1", "cross_attn",
                   "value_proj", "kernel") == "fusion10x"
        assert lab("depth_backbone", "downsample_path", "stage1_conv",
                   "kernel") == "base"

    def test_fixed_pretrained_freezes_non_temporal(self):
        # ``main_multi.py:380-386``
        assert param_group_label(("transformer", "encoder_layers_0", "ffn",
                                  "kernel"), "Baseline",
                                 fixed_pretrained_model=True) == "frozen"
        assert param_group_label(("transformer", "temporal_query_encoder_0",
                                  "kernel"), "Baseline",
                                 fixed_pretrained_model=True) != "frozen"


class TestCheckpointSurgery:
    def tree(self):
        return {"class_embed": {"kernel": np.ones((4, 3))},
                "transformer": {"temporal_decoder": {"w": np.ones(2)},
                                "encoder": {"w": np.zeros(2)}}}

    def test_drop_keys(self):
        t = ckpt.drop_keys(self.tree(), "class_embed")
        assert "class_embed" not in t
        assert "encoder" in t["transformer"]

    def test_select_keys(self):
        t = ckpt.select_keys(self.tree(), "temporal")
        assert list(t) == ["transformer"]
        assert list(t["transformer"]) == ["temporal_decoder"]

    def test_merge_matching_reports(self):
        base = self.tree()
        overlay = {"class_embed": {"kernel": np.full((4, 3), 7.0)},
                   "bogus": {"w": np.ones(1)},
                   "transformer": {"encoder": {"w": np.ones(3)}}}  # bad shape
        merged, rep = ckpt.merge_matching(base, overlay, verbose=False)
        assert float(merged["class_embed"]["kernel"][0, 0]) == 7.0
        assert "bogus/w" in rep["unexpected"]
        assert "transformer/encoder/w" in rep["shape_mismatch"]
        assert any("temporal_decoder" in m for m in rep["missing"])

    def test_merge_temporal_weights(self):
        base = self.tree()
        donor = {"class_embed": {"kernel": np.full((4, 3), 5.0)},
                 "transformer": {"temporal_decoder": {"w": np.full(2, 9.0)}}}
        merged = ckpt.merge_temporal_weights(base, temporal_params=donor)
        # only temporal keys taken from the temporal donor
        assert float(merged["transformer"]["temporal_decoder"]["w"][0]) == 9.0
        assert float(merged["class_embed"]["kernel"][0, 0]) == 1.0


class TestResNetConverter:
    def test_against_torch_resnet50(self, rng):
        """Build a torch ResNet-50 (FrozenBN semantics = eval-mode BN),
        convert its weights, and compare stage outputs to our flax trunk."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        class Bottleneck(tnn.Module):
            expansion = 4

            def __init__(self, cin, planes, stride=1, dilation=1,
                         downsample=None):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, stride,
                                        dilation, dilation, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
                self.bn3 = tnn.BatchNorm2d(planes * 4)
                self.downsample = downsample
                self.relu = tnn.ReLU()

            def forward(self, x):
                idt = x if self.downsample is None else self.downsample(x)
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                return self.relu(out + idt)

        class TorchR50(tnn.Module):
            def __init__(self, dilate_l4=True):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.relu = tnn.ReLU()
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                cfgs = [(64, 3, 1, False), (128, 4, 2, False),
                        (256, 6, 2, False), (512, 3, 2, dilate_l4)]
                cin = 64
                for i, (planes, blocks, stride, dilate) in enumerate(cfgs):
                    s = 1 if dilate else stride
                    ds = tnn.Sequential(
                        tnn.Conv2d(cin, planes * 4, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * 4))
                    layers = [Bottleneck(cin, planes, s, 1, ds)]
                    dil = stride if dilate else 1
                    cin = planes * 4
                    for _ in range(1, blocks):
                        layers.append(Bottleneck(cin, planes, 1, dil))
                    setattr(self, f"layer{i + 1}", tnn.Sequential(*layers))

            def forward(self, x):
                x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
                outs = []
                for i in range(1, 5):
                    x = getattr(self, f"layer{i}")(x)
                    outs.append(x)
                return outs

        torch.manual_seed(0)
        tm = TorchR50().eval()
        # randomize BN stats so the parity test is non-trivial
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)
                    m.weight.normal_(1, 0.1)
                    m.bias.normal_(0, 0.1)

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params, consts = ckpt.convert_torchvision_resnet50(sd)

        from dfvod_tpu.models.backbone_resnet import ResNet50
        import jax.numpy as jnp
        model = ResNet50(dilation=True, return_stages=(1, 2, 3, 4))
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t_outs = tm(torch.from_numpy(x))
        j_outs = model.apply(
            {"params": params, "constants": consts},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        for s in range(1, 5):
            ref = np.transpose(t_outs[s - 1].numpy(), (0, 2, 3, 1))
            got = np.asarray(j_outs[s])
            np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


class TestVideoLabeling:
    def test_video_uses_flat_groups(self):
        """Video training = the reference's flat 2-group optimizer
        (``main_multi.py:282-293``): no per-fusion freezing/10x even for
        LateFusion; linear projections still get the 0.1x group."""
        lab = lambda *p: param_group_label(  # noqa: E731
            p, "LateFusion", temporal=True)
        assert lab("detr", "backbone", "conv1", "kernel") == "base"
        assert lab("detr", "transformer", "depth_encoder_layer",
                   "cross_attn", "value_proj", "kernel") == "base"
        assert lab("detr", "transformer", "decoder_layers_0", "cross_attn",
                   "sampling_offsets", "kernel") == "linear_proj"
        assert lab("temporal_query_layer1", "self_attn", "q_proj",
                   "kernel") == "base"

    def test_video_fixed_pretrained_freezes_spatial(self):
        lab = lambda *p: param_group_label(  # noqa: E731
            p, "LateFusion", fixed_pretrained_model=True, temporal=True)
        assert lab("detr", "backbone", "conv1", "kernel") == "frozen"
        assert lab("temp_head_0", "class_embed", "kernel") != "frozen"
        assert lab("qrf_dynamic_layer1", "dynamic_layer",
                   "kernel") != "frozen"

    def test_single_frame_accepts_detr_nesting(self):
        """The spatial trunk nests under 'detr' inside temporal models;
        the single-frame backbone rules must see through the wrapper."""
        assert param_group_label(("detr", "backbone", "conv1", "kernel"),
                                 "LateFusion") == "frozen"
