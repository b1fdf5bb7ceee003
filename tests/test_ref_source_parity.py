"""Parity against the reference's OWN executable source.

``tests/test_full_model_parity.py`` pins dfvod_tpu against the re-typed
replica in ``tests/torch_ref.py``; a shared misreading of the reference
would pass that silently (VERDICT r2, Missing #2). Here the torch side
is ``import``ed from ``/root/reference`` itself (via ``tests/
ref_source.py`` shims): ``models/deformable_detr_single.py:621-709``
builds the model, ``models/deformable_transformer_single.py:179-338``
runs the forward, and the deformable-attention math inside the oracle is
the reference's ``ms_deform_attn_core_pytorch``
(``models/ops/functions/ms_deform_attn_func.py:41-61``).

Covers all four fusion modes at toy dims, the TransVOD++ video model
(``deformable_transformer_multi_plusplus.py:260-604``), and — VERDICT r2
task 8 — one PRODUCTION-dim case (d_model=256, 6+6 layers, 300 queries)
so dim-dependent layout bugs (head splits, num_pos_feats scaling) cannot
hide at d_model=64.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_source import (  # noqa: E402
    build_reference_model,
    load_reference_modules,
    perturb_,
    reference_args,
)
from test_full_model_parity import (  # noqa: E402
    DEPTH_TYPE,
    DIMS,
    assert_close,
    make_inputs,
)

from dfvod_tpu.models import build_model  # noqa: E402
from dfvod_tpu.utils.checkpoint import merge_matching  # noqa: E402
from dfvod_tpu.utils.config import Config, ModelConfig  # noqa: E402
from dfvod_tpu.utils.convert_reference import (  # noqa: E402
    convert_reference_state_dict,
)

# Dead parameters in the reference: instantiated but never executed in any
# forward, so the converter rightly has no mapping for them.
BENIGN_UNMAPPED_PREFIXES = (
    # torchvision resnet classifier head (backbone_scratch.py:157 builds
    # the full resnet50; the detection forward stops at layer4)
    "backbone.0.body.fc.",
    # QRF RCNNHeads 2 and 3: three heads are constructed
    # (deformable_transformer_multi_plusplus.py:155-157) but the forward
    # only ever calls ..._query1 (:501, :517)
    "transformer.dynamic_layer_for_current_query2.",
    "transformer.dynamic_layer_for_current_query3.",
)

TOY = dict(hidden_dim=DIMS["d_model"], nheads=DIMS["nhead"],
           enc_layers=DIMS["enc_layers"], dec_layers=DIMS["dec_layers"],
           dim_feedforward=DIMS["dim_feedforward"],
           num_queries=DIMS["num_queries"], num_classes=DIMS["num_classes"])
PROD = dict(hidden_dim=256, nheads=8, enc_layers=6, dec_layers=6,
            dim_feedforward=1024, num_queries=300, num_classes=3)


def build_pair(fusion_type, dims=TOY, with_box_refine=True,
               two_stage=False, video=False, num_ref_frames=2, seed=0):
    torch.manual_seed(seed)
    args = reference_args(
        fusion_type=fusion_type, dilation=True,
        with_box_refine=with_box_refine, two_stage=two_stage,
        use_depth=fusion_type != "Baseline",
        dataset_file="vid_multi_plusplus" if video else "vid_single",
        num_ref_frames=num_ref_frames, **dims)
    tm, _, _ = build_reference_model(args)
    if fusion_type == "Backbone_CrossFusion":
        # Released-reference wiring bug (documented in PARITY.md): build()
        # places the dformer cross-fusion backbone in the NEVER-CALLED
        # depth_backbone slot (deformable_detr_single.py:649-652) while the
        # crossfusion forward branch calls self.backbone (:249-251) — the
        # plain RGB from-scratch Joiner — so the released graph degenerates
        # to Baseline-with-dead-params (it would even crash if wired as
        # intended: the cf Joiner has no .name for :119). dfvod_tpu
        # implements the intended semantics (fusion executes), so the
        # oracle is rewired the intended way: the cf Joiner becomes the
        # backbone. Its fusion math then IS reference-executed code
        # (dformer_crossfusion_backbone.py:430-561).
        tm.backbone, tm.depth_backbone = tm.depth_backbone, None
        # Second latent defect in the never-executed module: the RGB
        # projection channels are built from model_num_channels[rgb][
        # layer - 2] (dformer_crossfusion_backbone.py:247) — i.e. layer2's
        # projection gets layer1's 256 channels — while the forward
        # applies input_rgb_proj2 AFTER body.layer2 (512 ch, :443-461).
        # Rebuild the projections at the channels the forward actually
        # produces (512/1024/2048); the values are irrelevant here since
        # both sides load the same state_dict through the converter.
        fb = tm.backbone[0]
        for layer, rgb_ch in {2: 512, 3: 1024, 4: 2048}.items():
            fb._init_fusion_layer(
                layer, rgb_ch, {2: 32, 3: 64, 4: 128}[layer],
                32, {2: 4, 3: 8, 4: 16}[layer], 256)
    perturb_(tm, seed=seed + 1)
    cfg = Config(model=ModelConfig(
        num_classes=dims["num_classes"], num_queries=dims["num_queries"],
        hidden_dim=dims["hidden_dim"], nheads=dims["nheads"],
        enc_layers=dims["enc_layers"], dec_layers=dims["dec_layers"],
        dim_feedforward=dims["dim_feedforward"], dropout=0.0,
        num_feature_levels=1, fusion_type=fusion_type,
        depth_backbone_type="dformer", with_box_refine=with_box_refine,
        two_stage=two_stage, dilation=True,
        use_depth=fusion_type != "Baseline",
        temporal_mode="transvod_pp" if video else "none",
        num_ref_frames=num_ref_frames if video else 0))
    model, _, _ = build_model(cfg)
    return tm, model, cfg


def convert_into(tm, variables, with_box_refine, video=False):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, model_state, unmapped = convert_reference_state_dict(
        sd, with_box_refine=with_box_refine, verbose=False, video=video)
    extra = {k for k in unmapped
             if not k.startswith(BENIGN_UNMAPPED_PREFIXES)}
    assert not extra, f"unconverted reference keys: {sorted(extra)[:8]}"
    merged, report = merge_matching(variables["params"], params,
                                    verbose=False)
    assert report["missing"] == [], report["missing"][:8]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:8]
    new_vars = dict(variables, params=merged)
    for coll, tree in model_state.items():
        if coll in new_vars:
            new_vars[coll], rep = merge_matching(new_vars[coll], tree,
                                                 verbose=False)
            assert rep["missing"] == [], (coll, rep["missing"][:8])
    return new_vars


def run_both(tm, model, variables, imgs, mask, video=False):
    load_reference_modules()
    # the reference's own NestedTensor — the multi++ model isinstance-checks
    # against util.misc_multi's class, the single model against util.misc's
    if video:
        from util.misc_multi import NestedTensor
    else:
        from util.misc import NestedTensor
    with torch.no_grad():
        t_out = tm(NestedTensor(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask)))
    j_out = jax.jit(lambda v, i, m: model.apply(v, i, m, train=False))(
        variables, jnp.asarray(imgs), jnp.asarray(mask))
    return t_out, j_out


def init_flax(model, imgs, mask):
    return jax.jit(
        lambda r: model.init(r, jnp.asarray(imgs), jnp.asarray(mask),
                             train=False))(jax.random.PRNGKey(0))


@pytest.mark.slow
class TestReferenceSourceParity:
    @pytest.mark.parametrize("fusion_type", [
        "Baseline", "LateFusion", "Encoder_CrossFusion"])
    def test_fusion_modes(self, fusion_type):
        # Backbone_CrossFusion is covered at production dims below: at toy
        # dims the reference cf path cannot execute at all — its fusion
        # tokens are hard-coded 256-wide (build_dformer_fusion_backbone,
        # dformer_crossfusion_backbone.py:645 `d_model = 256`) while its
        # position embedding is hidden_dim-wide (build_position_encoding),
        # so any hidden_dim != 256 crashes on the pos add.
        tm, model, cfg = build_pair(fusion_type)
        C = 4 if fusion_type != "Baseline" else 3
        imgs, mask = make_inputs(channels=C)
        variables = init_flax(model, imgs, mask)
        variables = convert_into(tm, variables, cfg.model.with_box_refine)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out)

    def test_two_stage(self):
        # production dims: the reference two-stage path hard-codes
        # num_pos_feats=128 in get_proposal_pos_embed
        # (deformable_transformer_single.py:108-131), so pos_trans
        # (Linear(2*d_model, .)) only shape-checks at d_model=256.
        tm, model, cfg = build_pair("Baseline", dims=PROD, two_stage=True)
        # >=300 encoder tokens so topk(two_stage_num_proposals) is legal
        # on both sides: 320x384 @ stride16 = 480 tokens
        imgs, mask = make_inputs(channels=3, H=320, W=384)
        variables = init_flax(model, imgs, mask)
        variables = convert_into(tm, variables, with_box_refine=True)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out)
        np.testing.assert_allclose(
            np.asarray(j_out["enc_outputs"]["pred_logits"]),
            t_out["enc_outputs"]["pred_logits"].numpy(),
            atol=1e-4, rtol=1e-3, err_msg="enc logits")

    def test_transvod_pp_video(self):
        # num_queries >= 80: the reference TQE rounds topk exactly
        # 80/50/30 x num_ref_frames reference queries with no clamp
        # (deformable_transformer_multi_plusplus.py:530), so fewer
        # queries than 80 cannot execute.
        dims = dict(TOY, num_queries=96)
        tm, model, cfg = build_pair("Baseline", dims=dims, video=True)
        imgs, mask = make_inputs(B=3, channels=3)
        variables = init_flax(model, imgs, mask)
        variables = convert_into(tm, variables, with_box_refine=True,
                                 video=True)
        t_out, j_out = run_both(tm, model, variables, imgs, mask,
                                video=True)
        assert_close(t_out, j_out, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("fusion_type", [
        "LateFusion", "Backbone_CrossFusion"])
    def test_production_dims(self, fusion_type):
        """VERDICT r2 task 8: d_model=256 / 6+6 layers / 300 queries —
        the configs/training/*.sh shape, against the reference source.
        Backbone_CrossFusion runs ONLY here (see test_fusion_modes)."""
        tm, model, cfg = build_pair(fusion_type, dims=PROD)
        imgs, mask = make_inputs(channels=4)
        variables = init_flax(model, imgs, mask)
        variables = convert_into(tm, variables, cfg.model.with_box_refine)
        t_out, j_out = run_both(tm, model, variables, imgs, mask)
        assert_close(t_out, j_out, atol=5e-4, rtol=1e-3)
