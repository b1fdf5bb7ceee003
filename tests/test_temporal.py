"""Tests for RoIAlign, DynamicConv/QRF pieces, and the TransVOD /
TransVOD++ temporal models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.models import build_model
from dfvod_tpu.ops.roi_align import roi_align
from dfvod_tpu.utils.config import Config, DataConfig, ModelConfig


class TestRoIAlign:
    def test_constant_map(self):
        feat = jnp.full((1, 8, 8, 3), 5.0)
        boxes = jnp.array([[[4.0, 4.0, 20.0, 20.0]]])  # image coords
        out = roi_align(feat, boxes, output_size=7, spatial_scale=0.25,
                        sampling_ratio=2)
        assert out.shape == (1, 1, 7, 7, 3)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)

    def test_linear_ramp_gives_bin_centers(self):
        # f(y, x) = x  ->  each output bin = x-coord of its center
        H = W = 16
        x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :],
                             (H, W))
        feat = x[None, :, :, None]
        x1, y1, x2, y2 = 2.0, 2.0, 10.0, 10.0
        boxes = jnp.array([[[x1, y1, x2, y2]]])
        P = 4
        out = roi_align(feat, boxes, output_size=P, spatial_scale=1.0,
                        sampling_ratio=2)[0, 0, :, :, 0]
        bin_w = (x2 - x1) / P
        expected_cols = x1 - 0.5 + (np.arange(P) + 0.5) * bin_w
        for r in range(P):
            np.testing.assert_allclose(np.asarray(out[r]), expected_cols,
                                       rtol=1e-5)

    def test_out_of_bounds_contributes_zero(self):
        feat = jnp.ones((1, 4, 4, 1))
        # roi entirely left of the image (after -0.5 alignment shift)
        boxes = jnp.array([[[-40.0, 0.0, -20.0, 4.0]]])
        out = roi_align(feat, boxes, output_size=2, spatial_scale=1.0,
                        sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_batch_isolation(self):
        feat = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
        boxes = jnp.tile(jnp.array([[[0.5, 0.5, 3.0, 3.0]]]), (2, 1, 1))
        out = roi_align(feat, boxes, output_size=2, spatial_scale=1.0,
                        sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1]), 1.0)

    def test_gradients_flow(self):
        feat = jnp.ones((1, 8, 8, 2))
        boxes = jnp.array([[[1.0, 1.0, 6.0, 6.0]]])

        def f(feat):
            return roi_align(feat, boxes, output_size=3,
                             spatial_scale=1.0).sum()

        g = jax.grad(f)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_boxes_get_no_gradient(self):
        """mmcv RoIAlign parity: grad_input only, rois receive zero
        cotangent (the reference QRF trains with that cut)."""
        feat = jnp.ones((1, 8, 8, 2))
        boxes = jnp.array([[[1.0, 1.3, 6.0, 6.4]]])

        def f(boxes):
            return roi_align(feat, boxes, output_size=3,
                             spatial_scale=1.0).sum()

        g = jax.grad(f)(boxes)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_pallas_hat_grad_matches_xla(self, rng):
        """The hat path's Pallas backward (features cotangent) must match
        the XLA path's autodiff (interpret mode)."""
        feat = jnp.asarray(rng.standard_normal((2, 9, 11, 8)), jnp.float32)
        boxes = jnp.asarray(
            [[[1.0, 1.5, 8.0, 7.0], [-3.0, -2.0, 2.0, 3.0],
              [6.0, 4.0, 14.0, 12.0], [-40.0, 0.0, -20.0, 4.0]]] * 2,
            jnp.float32)
        co = jnp.asarray(rng.standard_normal((2, 4, 3, 3, 8)), jnp.float32)

        def loss(feat, impl, interp):
            out = roi_align(feat, boxes, output_size=3, spatial_scale=1.0,
                            sampling_ratio=2, impl=impl, interpret=interp)
            return jnp.sum(out * co)

        g_ref = jax.grad(loss)(feat, "xla", False)
        g_hat = jax.grad(loss)(feat, "pallas_hat", True)
        np.testing.assert_allclose(np.asarray(g_hat), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_pallas_hat_path_matches_xla(self, rng):
        """The gather-free hat-kernel path (bf16 serving) must reproduce
        the XLA flat-gather path, including border clamping and the
        [-1, H] overshoot zeroing (interpret mode)."""
        feat = jnp.asarray(rng.standard_normal((2, 9, 11, 8)), jnp.float32)
        boxes = jnp.asarray(
            [[[1.0, 1.5, 8.0, 7.0], [-3.0, -2.0, 2.0, 3.0],
              [6.0, 4.0, 14.0, 12.0], [-40.0, 0.0, -20.0, 4.0]]] * 2,
            jnp.float32)
        ref = roi_align(feat, boxes, output_size=3, spatial_scale=1.0,
                        sampling_ratio=2, impl="xla")
        out = roi_align(feat, boxes, output_size=3, spatial_scale=1.0,
                        sampling_ratio=2, impl="pallas_hat",
                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_pallas_hat_qrf_shape(self, rng):
        """Production QRF geometry (downscaled): many rois per frame."""
        feat = jnp.asarray(rng.standard_normal((2, 10, 13, 16)),
                           jnp.float32)
        boxes = jnp.asarray(
            rng.uniform(-8, 48, (2, 17, 4)), jnp.float32)
        boxes = jnp.concatenate(
            [jnp.minimum(boxes[..., :2], boxes[..., 2:]),
             jnp.maximum(boxes[..., :2], boxes[..., 2:])], -1)
        ref = roi_align(feat, boxes, output_size=7, spatial_scale=0.25,
                        sampling_ratio=2, impl="xla")
        out = roi_align(feat, boxes, output_size=7, spatial_scale=0.25,
                        sampling_ratio=2, impl="pallas_hat",
                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def tiny_cfg(mode, n_ref=2):
    model = ModelConfig(
        num_classes=3, num_queries=12, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, dropout=0.0,
        num_feature_levels=1, use_depth=False, fusion_type="Baseline",
        with_box_refine=True, dilation=True, temporal_mode=mode,
        num_ref_frames=n_ref)
    return Config(model=model, data=DataConfig())


class TestTemporalModels:
    @pytest.mark.parametrize("mode", ["transvod", "transvod_pp"])
    def test_output_structure(self, mode):
        """Full abstract trace (shapes + dtype) without XLA compile."""
        cfg = tiny_cfg(mode)
        model, _, _ = build_model(cfg)
        F = 1 + cfg.model.num_ref_frames
        B = 2
        images = jnp.zeros((B * F, 64, 64, 3))
        mask = jnp.zeros((B * F, 64, 64), bool)

        out = jax.eval_shape(
            lambda r: model.init(r, images, mask, train=False),
            jax.random.PRNGKey(0))
        assert "params" in out

        params_shape = out["params"]
        names = set(params_shape.keys())
        assert "temporal_query_layer1" in names
        if mode == "transvod":
            assert "temporal_decoder" in names and "temp_head" in names
        else:
            assert {"qrf_dynamic_layer1", "temporal_decoder1",
                    "temp_head_0", "temp_head_2"} <= names

    def test_transvod_pp_forward(self):
        cfg = tiny_cfg("transvod_pp", n_ref=2)
        model, criterion, _ = build_model(cfg)
        F, B = 3, 1
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.standard_normal((B * F, 64, 64, 3)), jnp.float32)
        mask = jnp.zeros((B * F, 64, 64), bool)
        variables = jax.jit(
            lambda r: model.init(r, images, mask, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(
            lambda v: model.apply(v, images, mask, train=False))(variables)
        Q = cfg.model.num_queries
        assert out["pred_logits"].shape == (B, Q, 3)
        assert out["pred_boxes"].shape == (B, Q, 4)
        assert len(out["aux_outputs"]) == 2
        assert np.isfinite(np.asarray(out["pred_boxes"])).all()
        assert (np.asarray(out["pred_boxes"]) >= 0).all()
        assert (np.asarray(out["pred_boxes"]) <= 1).all()

        # criterion over key-frame targets
        targets = {"labels": jnp.ones((B, 4), jnp.int32),
                   "boxes": jnp.tile(jnp.array([.5, .5, .2, .2]), (B, 4, 1)),
                   "valid": jnp.tile(jnp.arange(4) < 2, (B, 1))}
        total, parts = jax.jit(lambda o, t: criterion(o, t))(
            {"pred_logits": out["pred_logits"],
             "pred_boxes": out["pred_boxes"],
             "aux_outputs": out["aux_outputs"]}, targets)
        assert np.isfinite(float(total))

    def test_two_stage_transvod_pp(self):
        """two_stage + temporal head — a combination the reference never
        exercises but the unified trunk must support (ROADMAP gap #5):
        encoder proposals drive the decoder queries, the temporal rounds
        run on top, and the key frame's enc_outputs stay available for
        enc losses."""
        import dataclasses
        cfg = tiny_cfg("transvod_pp", n_ref=2)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, two_stage=True))
        model, criterion, _ = build_model(cfg)
        F, B = 3, 1
        rng = np.random.default_rng(2)
        images = jnp.asarray(
            rng.standard_normal((B * F, 64, 64, 3)), jnp.float32)
        mask = jnp.zeros((B * F, 64, 64), bool)
        variables = jax.jit(
            lambda r: model.init(r, images, mask, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(
            lambda v: model.apply(v, images, mask, train=False))(variables)
        Q = cfg.model.num_queries
        assert out["pred_logits"].shape == (B, Q, 3)
        assert np.isfinite(np.asarray(out["pred_boxes"])).all()
        sf = out["_single_frame"]
        assert "enc_outputs" in sf
        assert sf["enc_outputs"]["pred_logits"].shape[0] == B

        targets = {"labels": jnp.ones((B, 4), jnp.int32),
                   "boxes": jnp.tile(jnp.array([.5, .5, .2, .2]),
                                     (B, 4, 1)),
                   "valid": jnp.tile(jnp.arange(4) < 2, (B, 1))}
        total, _ = jax.jit(lambda o, t: criterion(o, t))(
            {"pred_logits": out["pred_logits"],
             "pred_boxes": out["pred_boxes"],
             "aux_outputs": out["aux_outputs"],
             "enc_outputs": sf["enc_outputs"]}, targets)
        assert np.isfinite(float(total))

    def test_two_stage_transvod_pp_train_step(self):
        """One full gradient step on two_stage + TransVOD++ (ROADMAP gap
        #5's remaining half): the combination must not just trace — the
        backward through encoder proposals (stop_gradient on topk coords),
        QRF and the temporal rounds must produce finite grads and update
        the temporal heads."""
        import dataclasses
        from dfvod_tpu.train import create_train_state, make_train_step
        from dfvod_tpu.utils.config import TrainConfig
        cfg = tiny_cfg("transvod_pp", n_ref=2)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, two_stage=True),
            train=TrainConfig(lr=1e-4))
        model, criterion, _ = build_model(cfg)
        F, B, T = 3, 1, 4
        rng = np.random.default_rng(3)
        batch = {
            "images": rng.standard_normal(
                (B * F, 64, 64, 3)).astype(np.float32),
            "mask": np.zeros((B * F, 64, 64), bool),
            "labels": np.ones((B * F, T), np.int32),
            "boxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32),
                             (B * F, T, 1)),
            "valid": np.tile(np.arange(T) < 2, (B * F, 1)),
        }
        state, tx, labels = create_train_state(
            jax.random.PRNGKey(0), model, cfg, batch, steps_per_epoch=10)
        step = make_train_step(model, criterion, tx, donate=False,
                               frames=F, labels=labels)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        # temporal-head params moved
        before = jax.tree_util.tree_leaves(
            {k: v for k, v in state.params.items() if "temp" in k})
        after = jax.tree_util.tree_leaves(
            {k: v for k, v in new_state.params.items() if "temp" in k})
        assert before and any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after))

    def test_transvod_forward(self):
        cfg = tiny_cfg("transvod", n_ref=2)
        model, _, _ = build_model(cfg)
        F, B = 3, 2
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.standard_normal((B * F, 64, 64, 3)), jnp.float32)
        mask = jnp.zeros((B * F, 64, 64), bool)
        variables = jax.jit(
            lambda r: model.init(r, images, mask, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(
            lambda v: model.apply(v, images, mask, train=False))(variables)
        assert out["pred_logits"].shape == (B, cfg.model.num_queries, 3)
        assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_fixed_pretrained_model_forward(rng):
    """``--fixed_pretrained_model`` forward: the trunk stop_gradient must
    not swallow the STATIC spatial_shapes tuple (regression: tree_map'd
    stop_gradient turned it into traced scalars and broke the QRF shape
    math during the on-chip video fine-tune)."""
    import dataclasses
    cfg = tiny_cfg("transvod_pp", n_ref=2)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, fixed_pretrained_model=True))
    model, criterion, _ = build_model(cfg)
    F, B = 3, 1
    r = np.random.default_rng(5)
    images = jnp.asarray(r.standard_normal((B * F, 64, 64, 3)), jnp.float32)
    mask = jnp.zeros((B * F, 64, 64), bool)
    variables = jax.jit(lambda k: model.init(k, images, mask, train=False))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda v: model.apply(v, images, mask, train=False))(
        variables)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    # the frozen trunk yields zero grads; temporal heads still get them
    targets = {"labels": jnp.ones((B, 4), jnp.int32),
               "boxes": jnp.tile(jnp.array([.5, .5, .2, .2]), (B, 4, 1)),
               "valid": jnp.tile(jnp.arange(4) < 2, (B, 1))}

    def loss_fn(params):
        o = model.apply({**variables, "params": params}, images, mask,
                        train=False)
        return criterion({"pred_logits": o["pred_logits"],
                          "pred_boxes": o["pred_boxes"]}, targets)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    g_trunk = sum(float(jnp.abs(g).sum()) for g in
                  jax.tree_util.tree_leaves(grads["detr"]))
    g_temp = sum(float(jnp.abs(g).sum()) for g in
                 jax.tree_util.tree_leaves(grads["temporal_query_layer1"]))
    assert g_trunk == 0.0
    assert g_temp > 0.0
