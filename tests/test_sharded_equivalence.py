"""Sharded-vs-unsharded TRAIN-STEP equivalence (VERDICT r2, Missing #3).

The reference's distributed semantics are DDP gradient all-reduce plus the
criterion's ``num_boxes`` all_reduce (``util/misc.py:167-191``,
``deformable_detr_single.py:520-524``). In dfvod_tpu the same batch is one
logical jit program whether it lives on 1 device or is sharded over 8, so
the 8-device step must produce the SAME loss and the SAME updated
parameters as the 1-device step — the check that catches a wrong psum
denominator or a silently-wrong sharding spec, which finiteness (the old
dryrun assert) and rank-consistency (test_multihost) cannot.

Covers flat DP (single-frame LateFusion) and the 2-D ('clip','data') mesh
(TransVOD++ video, frames over 'clip', clips over 'data').
"""
import jax
import numpy as np
import pytest

from dfvod_tpu.models import build_model
from dfvod_tpu.parallel import make_mesh, shard_batch
from dfvod_tpu.train import create_train_state, make_train_step
from dfvod_tpu.utils.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)


def tiny_cfg(video=False):
    model = ModelConfig(
        num_classes=3, num_queries=30, hidden_dim=64, nheads=4,
        enc_layers=2, dec_layers=2, dim_feedforward=128, dropout=0.0,
        num_feature_levels=1, use_depth=True, fusion_type="LateFusion",
        with_box_refine=True, dilation=True,
        temporal_mode="transvod_pp" if video else "none",
        num_ref_frames=2 if video else 0)
    return Config(model=model, train=TrainConfig(batch_size=8),
                  data=DataConfig(use_depth=True))


def make_batch(rows, H=64, W=64, T=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.standard_normal((rows, H, W, 4)).astype(np.float32),
        "mask": np.zeros((rows, H, W), bool),
        "labels": np.full((rows, T), 1, np.int32),
        "boxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32),
                         (rows, T, 1)),
        "valid": np.tile(np.arange(T) < 2, (rows, 1)),
    }


def run_step(cfg, batch_np, mesh, frames, clip_parallel):
    """Fresh identical init (same PRNGKey) -> one step on the mesh."""
    model, criterion, _ = build_model(cfg)
    batch = shard_batch(batch_np, mesh, clip_parallel=clip_parallel)
    state, tx, labels = create_train_state(
        jax.random.PRNGKey(0), model, cfg, batch, steps_per_epoch=10)
    step = make_train_step(model, criterion, tx, mesh=mesh, frames=frames,
                           labels=labels, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    return state, new_state, jax.device_get(metrics)


def max_param_delta(a, b):
    deltas = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x) - np.asarray(y)))),
        a, b)
    return max(jax.tree_util.tree_leaves(deltas))


def assert_states_equal(s1, s8, tol):
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    assert len(leaves1) == len(leaves8)
    worst = max_param_delta(s1.params, s8.params)
    assert worst < tol, f"max updated-param delta {worst:.3e} >= {tol}"


@pytest.mark.slow
class TestShardedEquivalence:
    def test_flat_dp_single_frame(self):
        cfg = tiny_cfg(video=False)
        batch = make_batch(rows=8)
        mesh1 = make_mesh(jax.devices()[:1])
        mesh8 = make_mesh(jax.devices()[:8])
        s0a, s1, m1 = run_step(cfg, batch, mesh1, 1, False)
        s0b, s8, m8 = run_step(cfg, batch, mesh8, 1, False)
        # identical init sanity
        assert max_param_delta(s0a.params, s0b.params) == 0.0
        np.testing.assert_allclose(m1["loss"], m8["loss"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(m1["grad_norm"], m8["grad_norm"],
                                   rtol=1e-4, atol=1e-6)
        assert_states_equal(s1, s8, tol=1e-5)

    def test_clip_data_mesh_video(self):
        cfg = tiny_cfg(video=True)
        F = 1 + cfg.model.num_ref_frames
        batch = make_batch(rows=8 * F)
        mesh1 = make_mesh(jax.devices()[:1])
        mesh2d = make_mesh(jax.devices()[:8], clip=2)
        _, s1, m1 = run_step(cfg, batch, mesh1, F, False)
        _, s8, m8 = run_step(cfg, batch, mesh2d, F, True)
        np.testing.assert_allclose(m1["loss"], m8["loss"],
                                   rtol=1e-5, atol=1e-6)
        assert_states_equal(s1, s8, tol=1e-5)
