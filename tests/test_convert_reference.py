"""Reference-checkpoint converter tests: name mapping coverage + numeric
parity of the converted attention/linear weights against live torch
modules."""
import numpy as np
import pytest

from dfvod_tpu.utils.checkpoint import merge_matching
from dfvod_tpu.utils.convert_reference import convert_reference_state_dict


def rnd(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestNameMapping:
    def test_core_blocks_map(self, rng):
        C, F = 8, 16
        sd = {
            # encoder layer 0 (MSDA + FFN w/ norm2)
            "transformer.encoder.layers.0.self_attn.value_proj.weight":
                rnd(rng, C, C),
            "transformer.encoder.layers.0.self_attn.value_proj.bias":
                rnd(rng, C),
            "transformer.encoder.layers.0.norm1.weight": rnd(rng, C),
            "transformer.encoder.layers.0.linear1.weight": rnd(rng, F, C),
            "transformer.encoder.layers.0.norm2.bias": rnd(rng, C),
            # decoder layer (packed MHA + norm3 FFN)
            "transformer.decoder.layers.1.self_attn.in_proj_weight":
                rnd(rng, 3 * C, C),
            "transformer.decoder.layers.1.self_attn.out_proj.weight":
                rnd(rng, C, C),
            "transformer.decoder.layers.1.norm3.weight": rnd(rng, C),
            # heads + embeddings
            "class_embed.0.weight": rnd(rng, 3, C),
            "bbox_embed.0.layers.2.bias": rnd(rng, 4),
            "query_embed.weight": rnd(rng, 10, 2 * C),
            "transformer.level_embed": rnd(rng, 1, C),
            "transformer.reference_points.weight": rnd(rng, 2, C),
            "input_proj.0.0.weight": rnd(rng, C, C, 1, 1),
            "input_proj.0.1.weight": rnd(rng, C),
            # LateFusion layer (norm3 FFN + scale adapters)
            "transformer.depth_encoder_layer.depth_scale_adapt.weight":
                rnd(rng, C, C),
            "transformer.depth_encoder_layer.norm3.weight": rnd(rng, C),
            # DFormer stem + stage
            "depth_backbone.0.depth_backbone.downsample_layers_e.0.0.weight":
                rnd(rng, 4, 1, 3, 3),
            "depth_backbone.0.depth_backbone.downsample_layers_e.0.1."
            "running_mean": rnd(rng, 4),
            "depth_backbone.0.depth_backbone.downsample_layers_e.1.1.weight":
                rnd(rng, 16, 8, 3, 3),
            # temporal
            "transformer.temporal_query_layer1.norm1.weight": rnd(rng, C),
            "transformer.temporal_decoder.layers.0.norm2.weight":
                rnd(rng, C),
            "transformer.temporal_decoder3.layers.0.linear1.weight":
                rnd(rng, F, C),
            "temp_class_embed.weight": rnd(rng, 3, C),
            "temp_bbox_embed_list.2.layers.0.weight": rnd(rng, C, C),
            "transformer.dynamic_layer_for_current_query1."
            "inst_interact.dynamic_layer.weight": rnd(rng, 2 * C * 4, C),
            "transformer.dynamic_layer_for_current_query1."
            "self_attn.in_proj_bias": rnd(rng, 3 * C),
        }
        params, model_state, unmapped = convert_reference_state_dict(
            sd, verbose=False)
        assert unmapped == []

        def get(tree, *path):
            for k in path:
                tree = tree[k]
            return tree

        # linear transpose
        np.testing.assert_allclose(
            get(params, "transformer", "encoder_layers_0", "self_attn",
                "value_proj", "kernel"),
            sd["transformer.encoder.layers.0.self_attn.value_proj."
               "weight"].T)
        # FFN norm folding
        assert "norm" in get(params, "transformer", "encoder_layers_0",
                             "ffn")
        assert "norm" in get(params, "transformer", "decoder_layers_1",
                             "ffn")
        # packed MHA split
        q = get(params, "transformer", "decoder_layers_1", "self_attn",
                "q_proj", "kernel")
        np.testing.assert_allclose(
            q, sd["transformer.decoder.layers.1.self_attn."
                  "in_proj_weight"][:C].T)
        # heads
        assert get(params, "transformer", "head_0", "class_embed",
                   "kernel").shape == (C, 3)
        # embeddings are not transposed
        np.testing.assert_allclose(get(params, "transformer",
                                       "query_embed"),
                                   sd["query_embed.weight"])
        # conv layout
        assert get(params, "input_proj_0", "conv",
                   "kernel").shape == (1, 1, C, C)
        # dformer: stats to batch_stats, conv transposed
        assert get(model_state["batch_stats"], "depth_backbone",
                   "downsample_path", "stem_bn1", "mean").shape == (4,)
        assert get(params, "depth_backbone", "downsample_path",
                   "stage1_conv", "kernel").shape == (3, 3, 8, 16)
        # temporal routing
        assert "temporal_query_layer1" in params
        assert "layers_0" in params["temporal_decoder"]
        assert "layers_0" in params["temporal_decoder3"]
        assert "class_embed" in params["temp_head"]
        assert "bbox_layers_0" in params["temp_head_2"]
        assert "dynamic_layer" in get(params, "qrf_dynamic_layer1",
                                      "inst_interact")

    def _coverage_check(self, rng, cfg, sd_extra=None, in_ch=3):
        """Synthesize a reference-shaped state dict for ``cfg``'s trunk,
        convert it, and assert it covers our full param tree."""
        import jax
        import jax.numpy as jnp
        from dfvod_tpu.models import build_model
        from dfvod_tpu.utils.config import Config, ModelConfig  # noqa: F401

        model, _, _ = build_model(cfg)
        images = jnp.zeros((1, 64, 64, in_ch))
        mask = jnp.zeros((1, 64, 64), bool)
        variables = jax.eval_shape(
            lambda r: model.init(r, images, mask, train=False),
            jax.random.PRNGKey(0))

        # synthesize the reference-shaped state dict from our shape tree
        sd = {}
        C = cfg.model.hidden_dim

        def leaf(shape):
            return rnd(rng, *shape)

        # resnet (torchvision names) — reuse the proven converter by
        # generating names our ResNet tree needs
        import torch.nn as tnn  # noqa: F401  (torch presence check)
        for tname, shape in _resnet_names():
            sd[f"backbone.0.body.{tname}"] = leaf(shape)
        if sd_extra:
            sd.update(sd_extra)
        for i in range(cfg.model.enc_layers):
            b = f"transformer.encoder.layers.{i}"
            sd.update(_msda_names(f"{b}.self_attn", C, 1, 4, rng))
            sd[f"{b}.norm1.weight"] = leaf((C,))
            sd[f"{b}.norm1.bias"] = leaf((C,))
            sd[f"{b}.linear1.weight"] = leaf((64, C))
            sd[f"{b}.linear1.bias"] = leaf((64,))
            sd[f"{b}.linear2.weight"] = leaf((C, 64))
            sd[f"{b}.linear2.bias"] = leaf((C,))
            sd[f"{b}.norm2.weight"] = leaf((C,))
            sd[f"{b}.norm2.bias"] = leaf((C,))
        for i in range(cfg.model.dec_layers):
            b = f"transformer.decoder.layers.{i}"
            sd.update(_msda_names(f"{b}.cross_attn", C, 1, 4, rng))
            sd[f"{b}.self_attn.in_proj_weight"] = leaf((3 * C, C))
            sd[f"{b}.self_attn.in_proj_bias"] = leaf((3 * C,))
            sd[f"{b}.self_attn.out_proj.weight"] = leaf((C, C))
            sd[f"{b}.self_attn.out_proj.bias"] = leaf((C,))
            for n in ("norm1", "norm2", "norm3"):
                sd[f"{b}.{n}.weight"] = leaf((C,))
                sd[f"{b}.{n}.bias"] = leaf((C,))
            sd[f"{b}.linear1.weight"] = leaf((64, C))
            sd[f"{b}.linear1.bias"] = leaf((64,))
            sd[f"{b}.linear2.weight"] = leaf((C, 64))
            sd[f"{b}.linear2.bias"] = leaf((C,))
            # heads (per-layer with box refine)
            sd[f"class_embed.{i}.weight"] = leaf((3, C))
            sd[f"class_embed.{i}.bias"] = leaf((3,))
            for j in range(3):
                o = 4 if j == 2 else C
                sd[f"bbox_embed.{i}.layers.{j}.weight"] = leaf((o, C))
                sd[f"bbox_embed.{i}.layers.{j}.bias"] = leaf((o,))
        sd["query_embed.weight"] = leaf((6, 2 * C))
        sd["transformer.level_embed"] = leaf((1, C))
        sd["transformer.reference_points.weight"] = leaf((2, C))
        sd["transformer.reference_points.bias"] = leaf((2,))
        sd["input_proj.0.0.weight"] = leaf((C, 2048, 1, 1))
        sd["input_proj.0.0.bias"] = leaf((C,))
        sd["input_proj.0.1.weight"] = leaf((C,))
        sd["input_proj.0.1.bias"] = leaf((C,))

        params, model_state, unmapped = convert_reference_state_dict(
            sd, verbose=False)
        assert unmapped == []
        _, report = merge_matching(
            jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, np.float32),
                variables["params"]), params, verbose=False)
        assert report["missing"] == [], report["missing"][:10]
        assert report["shape_mismatch"] == [], report["shape_mismatch"][:5]
        for coll in ("constants", "batch_stats"):
            if coll not in variables:
                continue
            _, report_c = merge_matching(
                jax.tree_util.tree_map(
                    lambda s: np.zeros(s.shape, np.float32),
                    variables[coll]),
                model_state[coll], verbose=False)
            assert report_c["missing"] == [], (coll,
                                               report_c["missing"][:10])

    def test_full_model_coverage_baseline(self, rng):
        """Converted keys for a reference-shaped Baseline checkpoint cover
        our full Baseline param tree (no missing leaves outside known
        gaps)."""
        from dfvod_tpu.utils.config import Config, ModelConfig
        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=6, hidden_dim=32, nheads=4,
            enc_layers=2, dec_layers=2, dim_feedforward=64,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True, dilation=True))
        self._coverage_check(rng, cfg)

    def test_full_model_coverage_latefusion(self, rng):
        """Same zero-missing-keys guarantee for the flagship LateFusion
        RGB-D config: DFormer depth backbone
        (``depth_backbone.0.depth_backbone.*``), the depth input
        projection (``input_proj_depth.*``) and the depth cross-attn
        layer (``transformer.depth_encoder_layer.*``,
        ``deformable_transformer_single.py:341-402``)."""
        from dfvod_tpu.utils.config import Config, ModelConfig
        C = 32
        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=6, hidden_dim=C, nheads=4,
            enc_layers=2, dec_layers=2, dim_feedforward=64,
            num_feature_levels=1, fusion_type="LateFusion",
            use_depth=True, depth_backbone_type="dformer",
            with_box_refine=True, dilation=True))
        extra = {}

        def leaf(*shape):
            return rnd(rng, *shape)

        # DFormer DownsamplePath, dims (32, 64, 128), stem 16 -> 32
        de = "depth_backbone.0.depth_backbone.downsample_layers_e"
        for name, cin, cout in (("0.0", 1, 16), ("0.3", 16, 32)):
            extra[f"{de}.{name}.weight"] = leaf(cout, cin, 3, 3)
            extra[f"{de}.{name}.bias"] = leaf(cout)
        for name, ch in (("0.1", 16), ("0.4", 32), ("1.0", 32),
                         ("2.0", 64)):
            for bnleaf in ("weight", "bias", "running_mean",
                           "running_var"):
                extra[f"{de}.{name}.{bnleaf}"] = leaf(ch)
        for name, cin, cout in (("1.1", 32, 64), ("2.1", 64, 128)):
            extra[f"{de}.{name}.weight"] = leaf(cout, cin, 3, 3)
            extra[f"{de}.{name}.bias"] = leaf(cout)
        # depth input projection: DFormer 128ch -> d_model, conv + GN
        extra["input_proj_depth.0.0.weight"] = leaf(C, 128, 1, 1)
        extra["input_proj_depth.0.0.bias"] = leaf(C)
        extra["input_proj_depth.0.1.weight"] = leaf(C)
        extra["input_proj_depth.0.1.bias"] = leaf(C)
        # LateFusion depth cross-attn layer (single-linear GELU FFN +
        # scale adapters)
        b = "transformer.depth_encoder_layer"
        extra.update(_msda_names(f"{b}.cross_attn", C, 1, 4, rng))
        for mod, shapes in (
                ("norm1", [(C,), (C,)]),
                ("norm3", [(C,), (C,)]),
                ("norm_depth_scale", [(C,), (C,)]),
                ("linear1", [(C, C), (C,)]),
                ("depth_scale_adapt", [(C, C), (C,)]),
                ("cross_scale_adapt", [(C, C), (C,)])):
            extra[f"{b}.{mod}.weight"] = leaf(*shapes[0])
            extra[f"{b}.{mod}.bias"] = leaf(*shapes[1])
        self._coverage_check(rng, cfg, sd_extra=extra, in_ch=4)


def _msda_names(prefix, C, L, P, rng):
    M = 4
    return {
        f"{prefix}.sampling_offsets.weight": rnd(rng, M * L * P * 2, C),
        f"{prefix}.sampling_offsets.bias": rnd(rng, M * L * P * 2),
        f"{prefix}.attention_weights.weight": rnd(rng, M * L * P, C),
        f"{prefix}.attention_weights.bias": rnd(rng, M * L * P),
        f"{prefix}.value_proj.weight": rnd(rng, C, C),
        f"{prefix}.value_proj.bias": rnd(rng, C),
        f"{prefix}.output_proj.weight": rnd(rng, C, C),
        f"{prefix}.output_proj.bias": rnd(rng, C),
    }


def _resnet_names():
    """torchvision ResNet-50 (name, shape) list."""
    names = [("conv1.weight", (64, 3, 7, 7))]
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        names.append((f"bn1.{leaf}", (64,)))
    cin = 64
    for li, (planes, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
        for b in range(blocks):
            base = f"layer{li}.{b}"
            c_in = cin if b == 0 else planes * 4
            names.append((f"{base}.conv1.weight", (planes, c_in, 1, 1)))
            names.append((f"{base}.conv2.weight",
                          (planes, planes, 3, 3)))
            names.append((f"{base}.conv3.weight",
                          (planes * 4, planes, 1, 1)))
            for bn, ch in (("bn1", planes), ("bn2", planes),
                           ("bn3", planes * 4)):
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    names.append((f"{base}.{bn}.{leaf}", (ch,)))
            if b == 0:
                names.append((f"{base}.downsample.0.weight",
                              (planes * 4, c_in, 1, 1)))
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    names.append((f"{base}.downsample.1.{leaf}",
                                  (planes * 4,)))
        cin = planes * 4
    return names


class TestMHAParity:
    def test_converted_mha_matches_torch(self, rng):
        """Packed in_proj split + out_proj reproduces
        torch.nn.MultiheadAttention numerics through our module."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp
        from dfvod_tpu.models.layers import MultiHeadAttention

        C, M, B, Lq, Lk = 16, 4, 2, 5, 7
        tm = torch.nn.MultiheadAttention(C, M, dropout=0.0,
                                         batch_first=False)
        tm.eval()
        q = rnd(rng, B, Lq, C)
        k = rnd(rng, B, Lk, C)
        v = rnd(rng, B, Lk, C)
        with torch.no_grad():
            ref, _ = tm(torch.from_numpy(q).transpose(0, 1),
                        torch.from_numpy(k).transpose(0, 1),
                        torch.from_numpy(v).transpose(0, 1))
        ref = ref.transpose(0, 1).numpy()

        sd = {f"self_attn.{n}": p.detach().numpy()
              for n, p in tm.named_parameters()}
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        # route through the decoder-layer rule to exercise _emit_mha
        named = {f"transformer.decoder.layers.0.{k_}": v_
                 for k_, v_ in sd.items()}
        params, _, unmapped = convert_reference_state_dict(named,
                                                           verbose=False)
        assert unmapped == []
        p = params["transformer"]["decoder_layers_0"]["self_attn"]
        mha = MultiHeadAttention(C, M)
        out = mha.apply({"params": p}, jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5,
                                   rtol=1e-4)


class TestDFormerPretrainLoading:
    """Standalone DFormer-pretrain selective loading
    (``dformer_backbone.py:161-198``): ``downsample_layers_e.i.j`` names
    map onto the flat stem/stage scheme; BN running stats are skipped
    like the reference."""

    def _pretrain_sd(self, rng):
        return {
            "downsample_layers_e.0.0.weight": rnd(rng, 16, 1, 3, 3),
            "downsample_layers_e.0.0.bias": rnd(rng, 16),
            "downsample_layers_e.0.1.weight": rnd(rng, 16),
            "downsample_layers_e.0.1.bias": rnd(rng, 16),
            "downsample_layers_e.0.1.running_mean": rnd(rng, 16),
            "downsample_layers_e.0.1.running_var": rnd(rng, 16),
            "downsample_layers_e.0.3.weight": rnd(rng, 32, 16, 3, 3),
            "downsample_layers_e.0.3.bias": rnd(rng, 32),
            "downsample_layers_e.0.4.weight": rnd(rng, 32),
            "downsample_layers_e.0.4.bias": rnd(rng, 32),
            "downsample_layers_e.1.0.weight": rnd(rng, 32),
            "downsample_layers_e.1.0.bias": rnd(rng, 32),
            "downsample_layers_e.1.1.weight": rnd(rng, 64, 32, 3, 3),
            "downsample_layers_e.1.1.bias": rnd(rng, 64),
            "downsample_layers_e.2.0.weight": rnd(rng, 64),
            "downsample_layers_e.2.0.bias": rnd(rng, 64),
            "downsample_layers_e.2.1.weight": rnd(rng, 128, 64, 3, 3),
            "downsample_layers_e.2.1.bias": rnd(rng, 128),
            "some_other_module.weight": rnd(rng, 7),  # foreign: ignored
        }

    def test_name_mapping_and_stats_skip(self):
        from dfvod_tpu.utils.checkpoint import (
            convert_dformer_downsample_path,
        )
        rng = np.random.default_rng(0)
        sd = self._pretrain_sd(rng)
        params, stats = convert_dformer_downsample_path(sd)
        assert set(params) == {"stem_conv1", "stem_bn1", "stem_conv2",
                               "stem_bn2", "stage1_bn", "stage1_conv",
                               "stage2_bn", "stage2_conv"}
        # conv kernels transposed OIHW -> HWIO
        assert params["stem_conv1"]["kernel"].shape == (3, 3, 1, 16)
        assert params["stage2_conv"]["kernel"].shape == (3, 3, 64, 128)
        # reference skips running stats for the pretrain path
        assert stats == {}
        np.testing.assert_allclose(
            params["stem_bn1"]["scale"],
            sd["downsample_layers_e.0.1.weight"])

    def test_merges_into_init_tree(self):
        import jax
        import jax.numpy as jnp
        from dfvod_tpu.models.backbone_dformer import DFormerDownsamplePath
        from dfvod_tpu.utils.checkpoint import (
            convert_dformer_downsample_path,
        )
        rng = np.random.default_rng(1)
        params, _ = convert_dformer_downsample_path(self._pretrain_sd(rng))
        m = DFormerDownsamplePath()
        v = jax.jit(m.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 1)))
        merged, report = merge_matching(v["params"], params,
                                        verbose=False)
        assert report["missing"] == []
        assert report["unexpected"] == []
        assert report["shape_mismatch"] == []
        out = m.apply({"params": merged,
                       "batch_stats": v["batch_stats"]},
                      jnp.zeros((1, 64, 64, 1)))
        assert np.isfinite(np.asarray(out)).all()


class TestDFormerFlagResolution:
    """``main.py:213-214`` semantics: --dformer_weights implies the
    DFormer backbone; without either flag LateFusion/Encoder_CF fall
    back to the R18 research depth backbone."""

    def _cfg(self, *argv):
        from dfvod_tpu.cli.flags import config_from_args, get_args_parser
        return config_from_args(get_args_parser().parse_args(list(argv)))

    def test_default_is_r18_for_latefusion(self):
        cfg = self._cfg("--fusion_type", "LateFusion")
        assert cfg.model.depth_backbone_type == "resnet18"

    def test_dformer_backbone_flag(self):
        cfg = self._cfg("--fusion_type", "LateFusion", "--dformer_backbone")
        assert cfg.model.depth_backbone_type == "dformer"

    def test_dformer_weights_implies_backbone(self):
        cfg = self._cfg("--fusion_type", "Encoder_CrossFusion",
                        "--dformer_weights", "/tmp/x.pth")
        assert cfg.model.depth_backbone_type == "dformer"
        assert cfg.model.dformer_weights == "/tmp/x.pth"

    def test_crossfusion_unaffected(self):
        cfg = self._cfg("--fusion_type", "Backbone_CrossFusion")
        assert cfg.model.depth_backbone_type == "dformer"
