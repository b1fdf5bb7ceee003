"""Fused Pallas bottleneck stage: parity, folding, gradients.

Runs the kernel in interpret mode on the CPU CI mesh; the on-chip
compile + numerics probe (`fused_bottleneck._probe`) gates the real
Mosaic lowering in production exactly like the MSDA kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.ops.fused_bottleneck import (
    _stage_pallas,
    fused_bottleneck_stage,
    pick_tile_rows,
    reference_stage,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_blocks(rng, cin, cm, nblocks=3):
    blks = []
    for b in range(nblocks):
        c = cin if b == 0 else 4 * cm
        blks.append((
            jnp.asarray(rng.standard_normal((c, cm)) * .2, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((cm,)), jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * .2,
                        jnp.bfloat16),
            jnp.asarray(rng.standard_normal((cm,)), jnp.float32),
            jnp.asarray(rng.standard_normal((cm, 4 * cm)) * .2,
                        jnp.bfloat16),
            jnp.asarray(rng.standard_normal((4 * cm,)), jnp.float32),
            jnp.asarray(rng.standard_normal((c, 4 * cm)) * .2,
                        jnp.bfloat16) if b == 0 else None,
            jnp.asarray(rng.standard_normal((4 * cm,)), jnp.float32)
            if b == 0 else None,
        ))
    return tuple(blks)


class TestFusedStage:
    def test_interpret_parity(self, rng):
        """Bit-exact vs the unfused XLA formulation (same f32-accum /
        bf16-round structure) including the top/bottom halo tiles where
        conv zero-padding must not leak relu(bias)."""
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.bfloat16)
        blks = make_blocks(rng, 8, 8)
        got = _stage_pallas(x, blks, TR=8, interpret=True)
        ref = reference_stage(x, blks)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

    def test_single_tile_and_multi_tile_agree(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 24, 16, 8)), jnp.bfloat16)
        blks = make_blocks(rng, 8, 8, nblocks=2)
        a = _stage_pallas(x, blks, TR=24, interpret=True)
        b = _stage_pallas(x, blks, TR=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    def test_grad_path_is_reference_vjp(self, rng):
        """custom_vjp cotangent == XLA autodiff of the unfused form."""
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.bfloat16)
        blks = make_blocks(rng, 8, 8, nblocks=2)

        # interpret-mode stand-in for the chip kernel inside the vjp
        from dfvod_tpu.ops import fused_bottleneck as fb

        def loss_fused(xx, ww):
            TR = pick_tile_rows(xx.shape[1])
            return jnp.sum(fb._stage_vjp(xx, ww, TR).astype(jnp.float32))

        def loss_ref(xx, ww):
            from dfvod_tpu.ops.fused_bottleneck import grad_stage
            return jnp.sum(grad_stage(xx, ww).astype(jnp.float32))

        orig = fb._stage_pallas
        fb_interp = lambda x_, w_, TR, interpret=False: orig(
            x_, w_, TR, interpret=True)
        fb._stage_pallas = fb_interp
        try:
            gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, blks)
        finally:
            fb._stage_pallas = orig
        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, blks)
        np.testing.assert_allclose(np.asarray(gx, np.float32),
                                   np.asarray(rx, np.float32),
                                   rtol=2e-2, atol=2e-2)
        for g, r in zip(jax.tree_util.tree_leaves(gw),
                        jax.tree_util.tree_leaves(rw)):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(r, np.float32),
                                       rtol=2e-2, atol=2e-2)

    def test_pick_tile_rows(self):
        assert pick_tile_rows(152) == 8
        assert pick_tile_rows(160) == 10
        assert pick_tile_rows(96) == 8
        assert pick_tile_rows(149) is None  # prime -> fallback


class TestFoldedStageVsModule:
    def test_folded_weights_reproduce_module(self, rng):
        """Bottleneck.folded_weights + reference_stage == the unfused
        module chain (bf16 tolerance: folding reassociates the BN
        affine into the conv weights)."""
        from dfvod_tpu.models.backbone_resnet import ResNetStage

        # f32 end-to-end: isolates the BN-fold algebra from bf16
        # rounding (which compounds across random unnormalized blocks)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 64)),
                        jnp.float32)
        stage = ResNetStage(16, 3, 1, in_features=64, allow_fused=False)
        vs = jax.jit(stage.init)(jax.random.PRNGKey(0), x)
        # randomize BN constants so folding is non-trivial
        cs = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.uniform(0.5, 1.5, a.shape), jnp.float32),
            vs["constants"])
        vs = {"params": vs["params"], "constants": cs}
        ref = stage.apply(vs, x)

        bound = stage.bind(vs)
        blocks = [getattr(bound, f"block_{i}") for i in range(3)]
        folded = [b.folded_weights(x.dtype) for b in blocks]
        got = reference_stage(x, folded)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-4, atol=2e-3)
