"""Integrated gradients: exactness on linear models, completeness on a
real detector score, and the reference-matching visualization."""
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.utils.attribution import (
    integrated_gradients,
    visualize_integrated_gradients,
)


def test_linear_model_is_exact():
    """For f(x) = w.x, IG = w * x exactly (any step count), delta = 0."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((6, 5)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((6, 5)), jnp.float32)
    attr, delta = integrated_gradients(lambda z: jnp.sum(w * z), x,
                                       n_steps=4)
    np.testing.assert_allclose(np.asarray(attr), np.asarray(w * x),
                               rtol=1e-5)
    assert abs(float(delta)) < 1e-4


def test_completeness_on_nonlinear():
    """Attributions sum to f(x) - f(baseline) as n_steps grows."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

    def f(z):
        return jnp.sum(jnp.tanh(z) ** 2) + jnp.sum(z[:2] * z[2:4])

    attr, delta = integrated_gradients(f, x, n_steps=256)
    assert abs(float(delta)) < 1e-3 * max(1.0, abs(float(f(x))))
    np.testing.assert_allclose(float(attr.sum()), float(f(x) - f(0 * x)),
                               atol=2e-3)


def test_detector_score_attribution_shape(tmp_path):
    """IG through the real model on a tiny RGB-D input: attribution has
    the input's shape, is finite, and the reference-style 2x2 figure is
    written (``inference.py:972-1026``)."""
    import jax
    from dfvod_tpu.models import build_model
    from dfvod_tpu.utils.config import Config, ModelConfig

    cfg = Config(model=ModelConfig(
        num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
        num_feature_levels=1, fusion_type="LateFusion", use_depth=True,
        aux_loss=False))
    model, _, _ = build_model(cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((48, 48, 4)), jnp.float32)
    mask = jnp.zeros((1, 48, 48), bool)
    variables = jax.jit(lambda r: model.init(
        r, img[None], mask, train=False))(jax.random.PRNGKey(0))

    def hand_score(z):
        out = model.apply(variables, z[None], mask, train=False)
        return jnp.sum(jax.nn.sigmoid(out["pred_logits"])[..., 1])

    attr, delta = integrated_gradients(hand_score, img, n_steps=4)
    assert attr.shape == img.shape
    assert np.isfinite(np.asarray(attr)).all()
    assert np.isfinite(float(delta))

    out = visualize_integrated_gradients(
        np.asarray(img), np.asarray(attr),
        str(tmp_path / "ig.png"))
    import os
    assert os.path.exists(out)
