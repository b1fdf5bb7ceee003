"""Training-convergence test: the full pipeline (matcher + criterion +
per-group AdamW) overfits a tiny synthetic detection set — loss must drop
substantially in a few dozen steps. This is the optimization-correctness
anchor the reference only gets implicitly by watching mAP during training.
"""
import jax
import numpy as np

from dfvod_tpu.models import build_model
from dfvod_tpu.train import create_train_state, make_train_step
from dfvod_tpu.utils.config import Config, ModelConfig, TrainConfig


def test_overfit_synthetic_boxes(rng):
    cfg = Config(
        model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True, aux_loss=False),
        train=TrainConfig(lr=5e-4, epochs=100, clip_max_norm=0.5))
    model, criterion, _ = build_model(cfg)

    B, H, W, T = 2, 64, 64, 2
    images = rng.standard_normal((B, H, W, 3)).astype(np.float32) * 0.1
    # fixed boxes to memorize
    boxes = np.tile(np.array([[0.3, 0.4, 0.2, 0.25],
                              [0.7, 0.6, 0.15, 0.2]], np.float32),
                    (B, 1, 1))
    batch = {"images": images, "mask": np.zeros((B, H, W), bool),
             "labels": np.ones((B, T), np.int32), "boxes": boxes,
             "valid": np.ones((B, T), bool)}

    state, tx, _ = create_train_state(jax.random.PRNGKey(0), model, cfg,
                                      batch, steps_per_epoch=1)
    step = make_train_step(model, criterion, tx)
    losses = []
    for i in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < 0.4 * first, (first, last, losses[::10])
    # box L1 specifically must shrink (boxes are memorizable): mean
    # per-coordinate error below ~5% of the image
    assert float(metrics["loss_bbox"]) < 0.2, float(metrics["loss_bbox"])


def test_bf16_mixed_precision_training_converges(rng):
    """train_dtype='bfloat16': master params stay f32, loss decreases —
    the mixed-precision cast must not break optimization."""
    cfg = Config(
        model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True, aux_loss=False),
        train=TrainConfig(lr=5e-4, epochs=100, clip_max_norm=0.5,
                          train_dtype="bfloat16"))
    model, criterion, _ = build_model(cfg)

    B, H, W, T = 2, 64, 64, 2
    images = rng.standard_normal((B, H, W, 3)).astype(np.float32) * 0.1
    boxes = np.tile(np.array([[0.3, 0.4, 0.2, 0.25],
                              [0.7, 0.6, 0.15, 0.2]], np.float32),
                    (B, 1, 1))
    batch = {"images": images, "mask": np.zeros((B, H, W), bool),
             "labels": np.ones((B, T), np.int32), "boxes": boxes,
             "valid": np.ones((B, T), bool)}

    state, tx, _ = create_train_state(jax.random.PRNGKey(0), model, cfg,
                                      batch, steps_per_epoch=1)
    step = make_train_step(model, criterion, tx,
                           train_dtype=cfg.train.train_dtype)
    losses = []
    for i in range(40):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # master params and optimizer state stay f32 through the cast
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < 0.6 * first, (first, last, losses[::10])


def test_frozen_label_skips_backbone_gradients(rng):
    """``labels=`` on make_train_step reproduces requires_grad=False:
    frozen params get exact-zero grads (their backward is never traced),
    loss is identical, and — matching torch's clip_grad_norm_ over
    params with grads — the global grad norm excludes the frozen group
    (LateFusion freezes the RGB backbone, ``main.py:311-341``)."""
    cfg = Config(
        model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="LateFusion",
            with_box_refine=True, aux_loss=False),
        train=TrainConfig(lr=5e-4, epochs=100, clip_max_norm=1e9))
    model, criterion, _ = build_model(cfg)

    B, H, W, T = 1, 64, 64, 2
    batch = {
        "images": rng.standard_normal((B, H, W, 4)).astype(np.float32)
        * 0.1,
        "mask": np.zeros((B, H, W), bool),
        "labels": np.ones((B, T), np.int32),
        "boxes": np.tile(np.array([[0.3, 0.4, 0.2, 0.25],
                                   [0.7, 0.6, 0.15, 0.2]], np.float32),
                         (B, 1, 1)),
        "valid": np.ones((B, T), bool),
    }
    state, tx, labels = create_train_state(jax.random.PRNGKey(0), model,
                                           cfg, batch, steps_per_epoch=1)
    step_old = make_train_step(model, criterion, tx, donate=False)
    step_new = make_train_step(model, criterion, tx, donate=False,
                               labels=labels)
    s_old, m_old = step_old(state, batch, jax.random.PRNGKey(1))
    s_new, m_new = step_new(state, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_old["loss"]), float(m_new["loss"]),
                               rtol=1e-6)
    # frozen (RGB backbone) params identical either way
    for a, b in zip(jax.tree_util.tree_leaves(s_old.params["backbone"]),
                    jax.tree_util.tree_leaves(s_new.params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # with an unbinding clip (1e9), trainable updates agree. (Not
    # bitwise: removing the backbone backward reassociates reductions,
    # which moves near-null gradient directions — e.g. the input_proj
    # conv bias, whose gradient is the tiny residual GroupNorm leaves
    # of a per-channel shift. Tolerance sized to the 5e-4 update scale.)
    for a, b in zip(jax.tree_util.tree_leaves(s_old.params),
                    jax.tree_util.tree_leaves(s_new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # grad norm now excludes the (nonzero) frozen backbone grads
    assert float(m_new["grad_norm"]) <= float(m_old["grad_norm"]) + 1e-6
