"""FULL-MODEL torch parity — the round-1 correctness capstone.

Composes the re-typed torch replicas (``tests/torch_ref.py``) into the
reference's complete ``DeformableDETR`` (Baseline / LateFusion /
Encoder-CF / Backbone-CF, with and without box refinement, two-stage),
runs the torch state_dict through ``utils/convert_reference``, and asserts
the flax model reproduces the torch logits/boxes on random inputs with
non-trivial padding masks. This pins the *composition*: flatten ordering,
level embedding, valid-ratio scaling, reference-point grids, refine-head
chaining, fusion hooks and the converter's full-key coverage.

Reference forward being matched: ``deformable_detr_single.py:204-362`` +
``deformable_transformer_single.py:179-338``.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_ref import TorchDeformableDETR  # noqa: E402

from dfvod_tpu.models import build_model  # noqa: E402
from dfvod_tpu.utils.checkpoint import merge_matching  # noqa: E402
from dfvod_tpu.utils.config import Config, ModelConfig  # noqa: E402
from dfvod_tpu.utils.convert_reference import (  # noqa: E402
    convert_reference_state_dict,
)

DEPTH_TYPE = {
    "Baseline": "Baseline_rgb",
    "LateFusion": "DepthDeform_latefusion_dformer",
    "Encoder_CrossFusion": "DepthDeform_encoder_cf_dformer",
    "Backbone_CrossFusion": "DepthDeform_dformer_crossfusion",
}

DIMS = dict(num_classes=3, num_queries=12, d_model=64, nhead=4,
            enc_layers=2, dec_layers=2, dim_feedforward=128)


def make_inputs(seed=0, B=2, H=96, W=128, channels=4):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((B, H, W, channels)).astype(np.float32) * 0.5
    mask = np.zeros((B, H, W), bool)
    # non-trivial padding on image 1 (valid region 60 x 84)
    mask[1, 60:, :] = True
    mask[1, :, 84:] = True
    imgs[1][mask[1]] = 0.0
    return imgs, mask


def build_pair(fusion_type, with_box_refine=True, two_stage=False, seed=0):
    torch.manual_seed(seed)
    tm = TorchDeformableDETR(with_box_refine=with_box_refine,
                             two_stage=two_stage, dilation=True,
                             depth_type=DEPTH_TYPE[fusion_type],
                             **DIMS).eval()
    tm.randomize()
    cfg = Config(model=ModelConfig(
        num_classes=3, num_queries=12, hidden_dim=64, nheads=4,
        enc_layers=2, dec_layers=2, dim_feedforward=128, dropout=0.0,
        num_feature_levels=1, fusion_type=fusion_type,
        depth_backbone_type="dformer", with_box_refine=with_box_refine,
        two_stage=two_stage, dilation=True,
        use_depth=fusion_type != "Baseline"))
    model, _, _ = build_model(cfg)
    return tm, model, cfg


def convert_into(tm, variables, with_box_refine):
    """torch state_dict -> converted + merged flax variables, asserting
    FULL coverage in both directions."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, model_state, unmapped = convert_reference_state_dict(
        sd, with_box_refine=with_box_refine, verbose=False)
    assert unmapped == [], f"unconverted reference keys: {unmapped[:8]}"
    merged, report = merge_matching(variables["params"], params,
                                    verbose=False)
    assert report["missing"] == [], report["missing"][:8]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:8]
    new_vars = dict(variables)
    new_vars["params"] = merged
    for coll, tree in model_state.items():
        if coll in new_vars:
            new_vars[coll], rep = merge_matching(new_vars[coll], tree,
                                                 verbose=False)
            assert rep["missing"] == [], (coll, rep["missing"][:8])
    return new_vars


def run_both(tm, model, variables, imgs, mask):
    with torch.no_grad():
        t_out = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                   torch.from_numpy(mask))
    j_out = jax.jit(lambda v, i, m: model.apply(v, i, m, train=False))(
        variables, jnp.asarray(imgs), jnp.asarray(mask))
    return t_out, j_out


def assert_close(t_out, j_out, atol=1e-4, rtol=1e-3):
    np.testing.assert_allclose(
        np.asarray(j_out["pred_logits"]), t_out["pred_logits"].numpy(),
        atol=atol, rtol=rtol, err_msg="pred_logits")
    np.testing.assert_allclose(
        np.asarray(j_out["pred_boxes"]), t_out["pred_boxes"].numpy(),
        atol=atol, rtol=rtol, err_msg="pred_boxes")
    for i, (ta, ja) in enumerate(zip(t_out["aux_outputs"],
                                     j_out["aux_outputs"])):
        np.testing.assert_allclose(
            np.asarray(ja["pred_logits"]), ta["pred_logits"].numpy(),
            atol=atol, rtol=rtol, err_msg=f"aux {i} logits")
        np.testing.assert_allclose(
            np.asarray(ja["pred_boxes"]), ta["pred_boxes"].numpy(),
            atol=atol, rtol=rtol, err_msg=f"aux {i} boxes")


@pytest.mark.slow
class TestFullModelParity:
    @pytest.mark.parametrize("fusion_type", [
        "Baseline", "LateFusion", "Encoder_CrossFusion",
        "Backbone_CrossFusion"])
    def test_fusion_modes(self, fusion_type):
        tm, model, cfg = build_pair(fusion_type)
        C = 4 if fusion_type != "Baseline" else 3
        imgs, mask = make_inputs(channels=C)
        variables = jax.jit(
            lambda r: model.init(r, jnp.asarray(imgs), jnp.asarray(mask),
                                 train=False))(jax.random.PRNGKey(0))
        variables = convert_into(tm, variables, cfg.model.with_box_refine)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out)

    def test_no_box_refine_shared_heads(self):
        tm, model, cfg = build_pair("Baseline", with_box_refine=False)
        imgs, mask = make_inputs(channels=3)
        variables = jax.jit(
            lambda r: model.init(r, jnp.asarray(imgs), jnp.asarray(mask),
                                 train=False))(jax.random.PRNGKey(0))
        variables = convert_into(tm, variables, with_box_refine=False)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out)

    def test_transvod_pp_video(self):
        """Full TransVOD++ video forward: single-frame trunk over the
        (1+N)-frame clip, QRF (RoIAlign + DynamicConv), 3 TQE/temporal-
        decoder rounds with top-k hand-channel selection
        (``deformable_transformer_multi_plusplus.py:260-604``)."""
        from torch_ref import TorchTransVODPP
        import dataclasses
        torch.manual_seed(3)
        N = 2
        tm = TorchTransVODPP(num_ref_frames=N, with_box_refine=True,
                             two_stage=False, dilation=True,
                             depth_type="Baseline_rgb", **DIMS).eval()
        tm.randomize()
        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=12, hidden_dim=64, nheads=4,
            enc_layers=2, dec_layers=2, dim_feedforward=128, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True, dilation=True,
            temporal_mode="transvod_pp", num_ref_frames=N))
        model, _, _ = build_model(cfg)

        F = 1 + N
        imgs, mask = make_inputs(B=F, channels=3)
        variables = jax.jit(
            lambda r: model.init(r, jnp.asarray(imgs), jnp.asarray(mask),
                                 train=False))(jax.random.PRNGKey(0))
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, model_state, unmapped = convert_reference_state_dict(
            sd, with_box_refine=True, verbose=False, video=True)
        assert unmapped == [], unmapped[:8]
        merged, report = merge_matching(variables["params"], params,
                                        verbose=False)
        assert report["missing"] == [], report["missing"][:8]
        assert report["shape_mismatch"] == [], report["shape_mismatch"][:8]
        variables = dict(variables, params=merged)
        for coll, tree in model_state.items():
            if coll in variables:
                variables[coll], rep = merge_matching(variables[coll],
                                                      tree, verbose=False)
                assert rep["missing"] == [], (coll, rep["missing"][:8])

        with torch.no_grad():
            t_out = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                       torch.from_numpy(mask))
        j_out = jax.jit(
            lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, jnp.asarray(imgs), jnp.asarray(mask))
        assert_close(t_out, j_out, atol=2e-4, rtol=1e-3)

    def test_two_stage(self):
        tm, model, cfg = build_pair("Baseline", two_stage=True)
        imgs, mask = make_inputs(channels=3)
        variables = jax.jit(
            lambda r: model.init(r, jnp.asarray(imgs), jnp.asarray(mask),
                                 train=False))(jax.random.PRNGKey(0))
        variables = convert_into(tm, variables, with_box_refine=True)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out)
        np.testing.assert_allclose(
            np.asarray(j_out["enc_outputs"]["pred_logits"]),
            t_out["enc_outputs"]["pred_logits"].numpy(),
            atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(j_out["enc_outputs"]["pred_boxes"]),
            t_out["enc_outputs"]["pred_boxes"].numpy(),
            atol=1e-4, rtol=1e-3)
