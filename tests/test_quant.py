"""Int8 serving quantization (``ops/quant.py``) — correctness bounds.

The int8 path is a serving-only approximation; these tests pin (a) that
the mode-off path is bit-identical to the original modules (so nothing
moved for training/parity), and (b) that the W8A8 error is within the
expected quantization bound at every integration seam (dense, conv,
bottleneck block, full-model forward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.ops import quant


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


class TestPrimitives:
    def test_dense_int8_close(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((7, 33, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 96)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((96,)) * 0.01, jnp.float32)
        ref = x @ w + b
        got = quant.dense_int8(x, w, b)
        assert got.dtype == x.dtype
        # two symmetric int8 quantizations: ~1% relative worst case
        assert rel_err(got, ref) < 0.03

    def test_conv_int8_close(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 14, 18, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 32, 48)) * 0.1,
                        jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = quant.conv_int8(x, w, (1, 1), ((1, 1), (1, 1)))
        assert rel_err(got, ref) < 0.03

    def test_conv_int8_stride_dilation(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.2,
                        jnp.float32)
        for stride, dil in ((2, 1), (1, 2)):
            pad = dil
            ref = jax.lax.conv_general_dilated(
                x, w, (stride, stride), ((pad, pad), (pad, pad)),
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            got = quant.conv_int8(x, w, (stride, stride),
                                  ((pad, pad), (pad, pad)), (dil, dil))
            assert rel_err(got, ref) < 0.03

    def test_per_channel_scales(self):
        # a column 100x larger than the rest must not wash out the small
        # columns (the reason the scales are per-output-channel)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
        w = np.asarray(rng.standard_normal((16, 8)), np.float32) * 0.01
        w[:, 0] *= 1000.0
        w = jnp.asarray(w)
        ref = x @ w
        got = quant.dense_int8(x, w)
        assert rel_err(got[:, 1:], ref[:, 1:]) < 0.03


class TestQDense:
    def test_mode_off_bit_identical_to_dense(self):
        from dfvod_tpu.models.layers import QDense, dense
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((3, 11, 32)), jnp.float32)
        qd = QDense(24)
        nd = dense(24)
        v = qd.init(jax.random.PRNGKey(0), x)
        a = qd.apply(v, x)
        b = nd.apply(v, x)  # same param tree: kernel + bias
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # bf16 path too (serving casts the tree)
        vb = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), v)
        xb = x.astype(jnp.bfloat16)
        ab = qd.apply(vb, xb)
        bb = nd.apply(vb, xb)
        assert ab.dtype == bb.dtype == jnp.bfloat16
        assert np.array_equal(np.asarray(ab, np.float32),
                              np.asarray(bb, np.float32))

    def test_mode_on_close(self):
        from dfvod_tpu.models.layers import QDense
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((3, 11, 32)), jnp.float32)
        qd = QDense(24)
        v = qd.init(jax.random.PRNGKey(0), x)
        ref = qd.apply(v, x)
        with quant.int8_mode():
            got = qd.apply(v, x)
        assert rel_err(got, ref) < 0.03


class TestBottleneckInt8:
    def test_block_close(self):
        from dfvod_tpu.models.backbone_resnet import Bottleneck
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((2, 10, 12, 64)) * 0.5,
                        jnp.float32)
        blk = Bottleneck(64, 16, stride=2, downsample=True)
        v = blk.init(jax.random.PRNGKey(0), x)
        # randomize the FrozenBN constants so the fold is non-trivial
        c = jax.tree_util.tree_map(
            lambda t: jnp.asarray(
                rng.uniform(0.5, 1.5, t.shape), jnp.float32),
            v["constants"])
        v = {"params": v["params"], "constants": c}
        ref = blk.apply(v, x)
        with quant.int8_mode():
            got = blk.apply(v, x)
        # three chained quantized convs + residual
        assert rel_err(got, ref) < 0.08

    def test_mode_off_unchanged(self):
        from dfvod_tpu.models.backbone_resnet import Bottleneck
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
        blk = Bottleneck(64, 16)
        v = blk.init(jax.random.PRNGKey(0), x)
        a = blk.apply(v, x)
        b = blk.apply(v, x)
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestFullModelInt8:
    def test_serving_forward_drift(self):
        """Full small-model serving forward: int8 box/logit drift vs the
        bf16 baseline stays within the serving tolerance band."""
        from dfvod_tpu.models import build_model
        from dfvod_tpu.utils.config import Config, ModelConfig
        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=30, hidden_dim=64, nheads=4,
            enc_layers=2, dec_layers=2, dim_feedforward=128,
            num_feature_levels=1, use_depth=True, fusion_type="LateFusion",
            with_box_refine=True, dilation=True))
        model, _, _ = build_model(cfg)
        rng = np.random.default_rng(8)
        imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 4)),
                           jnp.float32)
        mask = jnp.zeros((1, 64, 64), bool)
        v = jax.jit(lambda r: model.init(r, imgs, mask, train=False))(
            jax.random.PRNGKey(0))
        ref = model.apply(v, imgs, mask, train=False)
        with quant.int8_mode():
            got = model.apply(v, imgs, mask, train=False)
        box_drift = np.abs(np.asarray(got["pred_boxes"], np.float32)
                           - np.asarray(ref["pred_boxes"],
                                        np.float32)).max()
        assert box_drift < 0.05, box_drift
        # mode restored: forward matches the baseline again
        again = model.apply(v, imgs, mask, train=False)
        assert np.array_equal(np.asarray(again["pred_boxes"]),
                              np.asarray(ref["pred_boxes"]))


class TestSeamPolicy:
    """Round-5 selective-seam allowlist (``quant.enabled(tag)``)."""

    def test_matcher_exact_and_prefix(self):
        with quant.int8_mode(seams=("ffn", "conv3x3*")):
            assert quant.enabled("ffn")
            assert quant.enabled("conv3x3_c128")
            assert quant.enabled("conv3x3_c512")
            assert not quant.enabled("proj")
            assert not quant.enabled("conv1x1_c256")
            # untagged check = "is the mode on at all"
            assert quant.enabled()
        assert not quant.enabled("ffn")

    def test_no_seams_means_all(self):
        with quant.int8_mode():
            assert quant.enabled("anything")

    def test_selective_bottleneck_partial_quant(self):
        """With only conv3x3 seams enabled, the 1x1 convs run the exact
        bf16 path, so the block output differs from both full-int8 and
        full-bf16 but stays within the (smaller) 3x3-only quant bound."""
        from dfvod_tpu.models.backbone_resnet import Bottleneck
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
        m = Bottleneck(in_features=64, planes=16, downsample=True)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        with quant.int8_mode(seams=("conv3x3*",)):
            got_sel = m.apply(v, x)
        with quant.int8_mode():
            got_all = m.apply(v, x)
        assert rel_err(got_sel, ref) < 0.05
        # selective path must actually differ from the all-int8 path
        # (i.e. some convs really fell back to bf16)
        assert not np.allclose(np.asarray(got_sel), np.asarray(got_all))
        assert not np.allclose(np.asarray(got_sel), np.asarray(ref))

    def test_static_act_scale_diagnostic(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((5, 16)) * 0.01, jnp.float32)
        w = jnp.asarray(rng.standard_normal((16, 8)) * 0.1, jnp.float32)
        with quant.static_act_scale(0.05):
            got = quant.dense_int8(x, w)
        # fixed scale 0.05 over a ~0.01-magnitude input: coarse but finite
        assert np.isfinite(np.asarray(got)).all()
