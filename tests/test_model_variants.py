"""Structure tests (abstract trace, no XLA compile) across the model
variant grid: all four fusion types, two-stage, multi-level pyramid."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.models import build_model
from dfvod_tpu.utils.config import Config, DataConfig, ModelConfig


def tiny(**kw):
    base = dict(num_classes=3, num_queries=12, hidden_dim=32, nheads=4,
                enc_layers=2, dec_layers=2, dim_feedforward=64,
                dropout=0.1, num_feature_levels=1, with_box_refine=True,
                dilation=True)
    base.update(kw)
    return Config(model=ModelConfig(**base), data=DataConfig())


def trace(cfg, C):
    model, _, _ = build_model(cfg)
    images = jnp.zeros((2, 64, 64, C))
    mask = jnp.zeros((2, 64, 64), bool)
    variables = jax.eval_shape(
        lambda r: model.init(r, images, mask, train=False),
        jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda v: model.apply(v, images, mask, train=False), variables)
    return variables, out


class TestFusionVariants:
    @pytest.mark.parametrize("fusion,C", [
        ("Baseline", 3), ("LateFusion", 4),
        ("Backbone_CrossFusion", 4), ("Encoder_CrossFusion", 4)])
    def test_structure(self, fusion, C):
        cfg = tiny(fusion_type=fusion, use_depth=C == 4)
        variables, out = trace(cfg, C)
        assert out["pred_logits"].shape == (2, 12, 3)
        assert out["pred_boxes"].shape == (2, 12, 4)
        assert len(out["aux_outputs"]) == cfg.model.dec_layers - 1
        names = set(variables["params"].keys())
        if fusion == "Backbone_CrossFusion":
            assert "d2r_fusion2" in variables["params"]["backbone"]
        if fusion in ("LateFusion", "Encoder_CrossFusion"):
            assert "depth_backbone" in names
            tnames = set(variables["params"]["transformer"].keys())
            if fusion == "LateFusion":
                assert "depth_encoder_layer" in tnames
            else:
                assert "fusion_layers_0" in tnames

    def test_two_stage(self):
        cfg = tiny(two_stage=True)
        variables, out = trace(cfg, 3)
        assert "enc_outputs" in out
        assert out["enc_outputs"]["pred_logits"].shape[0] == 2
        # two-stage has dec_layers + 1 heads (``deformable_detr_single.py``)
        tnames = set(variables["params"]["transformer"].keys())
        assert f"head_{cfg.model.dec_layers}" in tnames

    def test_remat_grad_parity(self, rng):
        """jax.checkpoint'ed encoder layers: identical forward, gradients
        equal to float noise (init with the plain model, apply with both)."""
        import jax
        import jax.numpy as jnp
        models = {}
        for remat in (False, True):
            models[remat], _, _ = build_model(tiny(remat=remat))
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        m = jnp.zeros((1, 64, 64), bool)
        v = jax.jit(lambda r: models[False].init(r, x, m, train=False))(
            jax.random.PRNGKey(0))
        grads = {}
        for remat in (False, True):
            def loss(p, remat=remat):
                out = models[remat].apply({**v, "params": p}, x, m,
                                          train=False)
                return jnp.sum(out["pred_boxes"])
            grads[remat] = jax.jit(jax.grad(loss))(v["params"])
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            grads[True], grads[False])
        assert max(jax.tree_util.tree_leaves(deltas)) < 1e-5

    def test_masks_head_and_losses(self, rng):
        """--masks wiring (``main.py:110`` / DETRsegm): pred_masks output
        at backbone-layer1 resolution, focal+dice losses finite and
        differentiable."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dfvod_tpu.models import build_model
        from dfvod_tpu.utils.config import Config, ModelConfig
        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=6, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline", masks=True,
            aux_loss=False))
        model, criterion, _ = build_model(cfg)
        B, H, W, T = 1, 64, 64, 2
        x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        mask = jnp.zeros((B, H, W), bool)
        v = jax.jit(lambda r: model.init(r, x, mask, train=False))(
            jax.random.PRNGKey(0))
        out = model.apply(v, x, mask, train=False)
        # FPN upsamples the stride-16 memory through layers 3/2/1 -> s4
        assert out["pred_masks"].shape == (B, 6, H // 4, W // 4)

        targets = {
            "labels": jnp.ones((B, T), jnp.int32),
            "boxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.3, 0.3]),
                              (B, T, 1)),
            "valid": jnp.ones((B, T), bool),
            "masks": jnp.zeros((B, T, H // 4, W // 4)
                               ).at[:, :, 4:10, 4:10].set(1.0),
        }
        total, parts = criterion(out, targets)
        assert np.isfinite(float(total))
        assert "loss_mask" in parts and "loss_dice" in parts
        assert float(parts["loss_dice"]) > 0

        def loss_fn(params):
            o = model.apply({**v, "params": params}, x, mask, train=False)
            return criterion(o, targets)[0]

        g = jax.jit(jax.grad(loss_fn))(v["params"])
        gm = jax.tree_util.tree_leaves(g["mask_branch"])
        assert all(np.isfinite(np.asarray(t)).all() for t in gm)
        assert max(float(jnp.abs(t).max()) for t in gm) > 0

    def test_stem_s2d_exact(self):
        """Space-to-depth conv1 is an exact reparameterization of the
        7x7 stride-2 conv — same param tree, same outputs (f32)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dfvod_tpu.models.backbone_resnet import ResNet50
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 64, 96, 3)), jnp.float32)
        m_ref = ResNet50(dilation=True, stem_s2d=False,
                         return_stages=(1, 4))
        v = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
        ref = m_ref.apply(v, x)
        out = ResNet50(dilation=True, stem_s2d=True,
                       return_stages=(1, 4)).apply(v, x)
        # layer1: only reassociation noise from the reparameterized conv
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   atol=1e-3, rtol=1e-5)
        # layer4: the ~1e-6 relative drift amplified through 50 layers
        # of an untrained (unnormalized) network
        np.testing.assert_allclose(np.asarray(out[4]), np.asarray(ref[4]),
                                   atol=0.1, rtol=1e-3)

    def test_dformer_stem_s2d_exact(self):
        """DFormer stem space-to-depth convs are an exact
        reparameterization of the 3x3 stride-2 convs — same param tree,
        same outputs."""
        from dfvod_tpu.models.backbone_dformer import DFormerDownsamplePath
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 64, 96, 1)), jnp.float32)
        m_ref = DFormerDownsamplePath(stem_s2d=False)
        v = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
        ref = m_ref.apply(v, x)
        out = DFormerDownsamplePath(stem_s2d=True).apply(v, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-5)

    def test_dformer_stem_s2d_odd_fallback(self):
        """Odd spatial dims fall back to the plain stride-2 conv with the
        identical param tree."""
        from dfvod_tpu.models.backbone_dformer import DFormerDownsamplePath
        x = jnp.zeros((1, 63, 96, 1), jnp.float32)
        m = DFormerDownsamplePath(stem_s2d=True)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        v2 = jax.jit(DFormerDownsamplePath(stem_s2d=False).init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1), jnp.float32))
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(v2)
        m.apply(v, x)  # traces through the fallback path

    def test_resnet18_depth_backbone(self):
        cfg = tiny(fusion_type="LateFusion", use_depth=True,
                   depth_backbone_type="resnet18")
        variables, out = trace(cfg, 4)
        db = variables["params"]["depth_backbone"]
        assert "layer3" in db and "layer4" not in db
        # stride-16, 256-ch single level (``depth_backbone.py:75-77``)
        assert out["pred_logits"].shape == (2, 12, 3)

    def test_multi_level_pyramid(self):
        cfg = tiny(num_feature_levels=4)
        variables, out = trace(cfg, 3)
        # 3 backbone stages + 1 extra stride-64 projection
        names = set(variables["params"].keys())
        assert {"input_proj_0", "input_proj_1", "input_proj_2",
                "input_proj_3"} <= names
        assert out["pred_logits"].shape == (2, 12, 3)


class TestCrossfusionConverterRules:
    def test_crossfusion_keys_map(self, rng):
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        r = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa
        sd = {
            "backbone.0.d_body.downsample_layers_e.0.0.weight":
                r(16, 1, 3, 3),
            "backbone.0.d_body.downsample_layers_e.1.0.running_var":
                r(32),
            "backbone.0.input_rgb_proj2.0.weight": r(32, 512, 1, 1),
            "backbone.0.output_d_proj3.1.weight": r(64),
            "backbone.0.d2r_fusion2.cross_attn.value_proj.weight":
                r(32, 32),
            "backbone.0.d2r_fusion2.norm3.weight": r(32),
            "backbone.0.r2d_fusion2.depth_scale_adapt.bias": r(32),
        }
        params, model_state, unmapped = convert_reference_state_dict(
            sd, verbose=False)
        assert unmapped == []
        b = params["backbone"]
        assert b["stem_conv1"]["kernel"].shape == (3, 3, 1, 16)
        assert model_state["batch_stats"]["backbone"]["stage1_bn"][
            "var"].shape == (32,)
        assert b["input_rgb_proj2"]["conv"]["kernel"].shape == \
            (1, 1, 512, 32)
        assert "scale" in b["output_d_proj3"]["gn"]
        assert "kernel" in b["d2r_fusion2"]["cross_attn"]["value_proj"]
        assert "norm" in b["d2r_fusion2"]["ffn"]
        assert "bias" in b["r2d_fusion2"]["depth_scale_adapt"]


class TestEncoderCFMultiLevel:
    def test_multi_level_encoder_cf_traces(self):
        """Regression: Encoder_CrossFusion with a multi-level RGB pyramid
        used to crash on the RGB-mask-onto-depth-tokens quirk."""
        cfg = tiny(fusion_type="Encoder_CrossFusion", use_depth=True,
                   num_feature_levels=4)
        variables, out = trace(cfg, 4)
        assert out["pred_logits"].shape == (2, 12, 3)
