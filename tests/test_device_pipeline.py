"""On-device preprocessing pipeline tests: uint8 loader path + in-jit
normalization parity with the host path, and the host-packed
space-to-depth (pack_s2d) route."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.data.device_pipeline import (
    device_normalize,
    device_normalize_s2d,
    pack_s2d,
)
from dfvod_tpu.data.transforms import Sample, normalize_and_pad, pad_u8


def sample(rng, h=20, w=28):
    return Sample(rgb=rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
                  depth=rng.integers(0, 255, (h, w)).astype(np.uint8),
                  boxes=np.array([[2., 2., 10., 12.]], np.float32),
                  labels=np.array([1]), orig_size=(h, w))


class TestDevicePipeline:
    def test_parity_with_host_path(self, rng):
        s = sample(rng)
        host = normalize_and_pad(s, (32, 32), True, 4)
        dev = pad_u8(s, (32, 32), True, 4)
        img, mask = device_normalize(jnp.asarray(dev["image"][None]),
                                     jnp.asarray(dev["size"][None]))
        np.testing.assert_allclose(np.asarray(img[0]), host["image"],
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(mask[0]), host["mask"])
        np.testing.assert_allclose(dev["boxes"], host["boxes"])
        np.testing.assert_array_equal(dev["valid"], host["valid"])

    def test_train_step_accepts_uint8(self, rng):
        """The jitted step normalizes in-graph (fuses into the model)."""
        import jax
        from dfvod_tpu.models import build_model
        from dfvod_tpu.train import create_train_state, make_train_step
        from dfvod_tpu.utils.config import Config, ModelConfig

        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True))
        model, criterion, _ = build_model(cfg)
        B, H, W, T = 2, 64, 64, 4
        batch = {
            "images": rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8),
            "sizes": np.array([[64, 64], [48, 56]], np.int64),
            "labels": np.ones((B, T), np.int32),
            "boxes": np.tile(np.array([.5, .5, .2, .2], np.float32),
                             (B, T, 1)),
            "valid": np.tile(np.arange(T) < 1, (B, 1)),
        }
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), model,
                                          cfg, batch, 10)
        step = make_train_step(model, criterion, tx)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))


class TestPackS2D:
    """Host-packed 2x2 space-to-depth route (``pack_s2d`` →
    ``device_normalize_s2d`` → the stems' packed dispatch)."""

    def test_normalize_equivalence(self, rng):
        """device_normalize_s2d(pack_s2d(u8)) is bit-equal to the packed
        rearrangement of device_normalize(u8) — same scalars, same op
        order, per-block pad zeroing matches the full-res mask."""
        imgs = rng.integers(0, 255, (2, 32, 40, 4)).astype(np.uint8)
        sizes = np.array([[32, 40], [21, 27]], np.int64)
        ref_img, ref_mask = device_normalize(jnp.asarray(imgs),
                                             jnp.asarray(sizes))
        got_img, got_mask = device_normalize_s2d(
            jnp.asarray(pack_s2d(imgs)), jnp.asarray(sizes))
        np.testing.assert_array_equal(np.asarray(got_img),
                                      pack_s2d(np.asarray(ref_img)))
        np.testing.assert_array_equal(np.asarray(got_mask),
                                      np.asarray(ref_mask))

    def test_rejects_single_channel(self):
        with pytest.raises(AssertionError, match="RGB or RGB-D"):
            pack_s2d(np.zeros((1, 4, 4, 1), np.uint8))

    def test_loader_pack_flag(self, coco_dir):
        from dfvod_tpu.data.dataset import CocoDetectionDataset
        from dfvod_tpu.data.loader import Loader
        from dfvod_tpu.data.transforms import EvalTransform
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)
        kw = dict(batch_size=2, max_boxes=4, use_depth=True, shuffle=False,
                  bucket_step=32, pad_cap=64, device_preprocess=True)
        tf = EvalTransform(short_side=48, max_size=64)
        plain = next(iter(Loader(ds, tf, **kw)))
        packed = next(iter(Loader(ds, tf, pack_s2d=True, **kw)))
        assert packed["image"].shape[-1] == 16
        np.testing.assert_array_equal(packed["image"],
                                      pack_s2d(plain["image"]))
        for k in plain:
            if k != "image":
                np.testing.assert_array_equal(packed[k], plain[k], err_msg=k)

    def test_loader_pack_requires_device_preprocess(self, coco_dir):
        from dfvod_tpu.data.dataset import CocoDetectionDataset
        from dfvod_tpu.data.loader import Loader
        from dfvod_tpu.data.transforms import EvalTransform
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)
        with pytest.raises(ValueError, match="device_preprocess"):
            Loader(ds, EvalTransform(short_side=48, max_size=64),
                   batch_size=2, pack_s2d=True)

    def test_detr_packed_matches_unpacked(self, rng):
        """Full LateFusion (DFormer depth) forward: packed s2d input and
        plain RGB-D input produce the same outputs."""
        from dfvod_tpu.models import build_model
        from dfvod_tpu.utils.config import Config, ModelConfig

        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, use_depth=True, fusion_type="LateFusion",
            depth_backbone_type="dformer", with_box_refine=True))
        model, _, _ = build_model(cfg)
        imgs = rng.integers(0, 255, (2, 64, 64, 4)).astype(np.uint8)
        sizes = np.array([[64, 64], [48, 56]], np.int64)
        x, mask = device_normalize(jnp.asarray(imgs), jnp.asarray(sizes))
        xp, maskp = device_normalize_s2d(jnp.asarray(pack_s2d(imgs)),
                                         jnp.asarray(sizes))
        variables = jax.jit(
            lambda r: model.init(r, x, mask, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(
            lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, x, mask)
        outp = jax.jit(
            lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, xp, maskp)
        np.testing.assert_allclose(np.asarray(outp["pred_logits"]),
                                   np.asarray(out["pred_logits"]),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(outp["pred_boxes"]),
                                   np.asarray(out["pred_boxes"]),
                                   atol=2e-5, rtol=1e-5)

    def test_temporal_packed_matches_unpacked(self, rng):
        """TransVOD++ with packed input: whwh must come from the full-res
        mask, not the (H/2, W/2) packed image tensor (advisor finding
        r1) — otherwise RoIAlign samples half-scale regions and the
        packed outputs diverge."""
        from dfvod_tpu.models import build_model
        from dfvod_tpu.utils.config import Config, DataConfig, ModelConfig

        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=12, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=2, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, use_depth=False, fusion_type="Baseline",
            with_box_refine=True, dilation=True,
            temporal_mode="transvod_pp", num_ref_frames=2),
            data=DataConfig())
        model, _, _ = build_model(cfg)
        F = 3
        imgs = rng.integers(0, 255, (F, 64, 64, 3)).astype(np.uint8)
        sizes = np.array([[64, 64], [48, 56], [64, 48]], np.int64)
        x, mask = device_normalize(jnp.asarray(imgs), jnp.asarray(sizes))
        xp, maskp = device_normalize_s2d(jnp.asarray(pack_s2d(imgs)),
                                         jnp.asarray(sizes))
        variables = jax.jit(
            lambda r: model.init(r, x, mask, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(
            lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, x, mask)
        outp = jax.jit(
            lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, xp, maskp)
        np.testing.assert_allclose(np.asarray(outp["pred_logits"]),
                                   np.asarray(out["pred_logits"]),
                                   atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(outp["pred_boxes"]),
                                   np.asarray(out["pred_boxes"]),
                                   atol=5e-5, rtol=1e-4)
