"""Pallas MSDA kernel parity tests (interpreter mode — exact same kernel
code path as TPU, minus Mosaic lowering). Mirrors the reference's
``models/ops/test.py`` forward checks against the grid-sample oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.ops.msda import ms_deform_attn_xla
from dfvod_tpu.ops.msda_pallas import (
    corner_indices_weights,
    ms_deform_attn_pallas,
)


def make_inputs(rng, B=2, M=4, D=16, P=4, shapes=((6, 9), (3, 5)), Lq=37):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)),
                      jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((B, Lq, M, L * P)), jnp.float32)).reshape(
        B, Lq, M, L, P)
    return v, loc, w, shapes


class TestPallasParity:
    def test_multilevel(self, rng):
        v, loc, w, shapes = make_inputs(rng)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_single_level_production_shape(self, rng):
        # stride-16 encoder shape (downscaled), Lq == S
        v, loc, w, shapes = make_inputs(rng, B=1, M=8, D=32, P=4,
                                        shapes=((19, 25),), Lq=475)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_query_padding_path(self, rng):
        # Lq not a multiple of the 256-query block
        v, loc, w, shapes = make_inputs(rng, Lq=300)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_all_out_of_bounds_is_zero(self, rng):
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        loc = jnp.full_like(loc, 7.0)  # far outside every level
        out = ms_deform_attn_pallas(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestFlatFormulation:
    """The fast TPU path: single flat-table row gather."""

    def test_parity_multilevel(self, rng):
        from dfvod_tpu.ops.msda import ms_deform_attn_flat
        v, loc, w, shapes = make_inputs(rng)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_flat(v, shapes, loc, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients_match_gather_path(self, rng):
        from dfvod_tpu.ops.msda import ms_deform_attn_flat
        v, loc, w, shapes = make_inputs(rng, B=1, M=2, D=8, P=2,
                                        shapes=((5, 7),), Lq=11)

        def loss(f, v, loc, w):
            return jnp.sum(jnp.sin(f(v, shapes, loc, w)))

        g_ref = jax.grad(loss, argnums=(1, 2, 3))(
            lambda v, s, l, w: ms_deform_attn_xla(v, s, l, w), v, loc, w)
        g_new = jax.grad(loss, argnums=(1, 2, 3))(
            lambda v, s, l, w: ms_deform_attn_flat(v, s, l, w),
            v, loc, w)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


class TestCornerIndicesWeights:
    def test_weights_sum_to_attention(self, rng):
        """In-bounds corner weights per point sum to the attention weight."""
        v, loc, w, shapes = make_inputs(rng, Lq=16)
        loc = jnp.clip(loc, 0.2, 0.8)  # keep every corner in bounds
        idx, cw = corner_indices_weights(shapes, loc, w)
        # (B, Lq, M, L*P*4) -> per (L, P): 4 corners sum to attw
        B, Lq, M, K = cw.shape
        L = len(shapes)
        P = K // (L * 4)
        # layout is [l0c0 | l0c1 | l0c2 | l0c3 | l1c0 | ...] per level
        cw = cw.reshape(B, Lq, M, L, 4, P).sum(axis=4)
        np.testing.assert_allclose(np.asarray(cw), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)

    def test_indices_in_range(self, rng):
        v, loc, w, shapes = make_inputs(rng)
        S = v.shape[1]
        idx, _ = corner_indices_weights(shapes, loc, w)
        assert int(idx.min()) >= 0 and int(idx.max()) < S


class TestHatKernel:
    """Separable tent-product W build — the production bf16 kernel."""

    def test_interpret_parity_multilevel(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_f32_split_precision_path(self, rng):
        """f32 values route through the split-precision (hi/lo bf16,
        3-matmul) path inside the kernel and must land within ~1e-4
        relative of the exact-f32 XLA formulation (VERDICT r1 #5 — the
        reference CUDA kernel serves all dtypes)."""
        import jax.numpy as jnp
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng)
        assert v.dtype == jnp.float32
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-3)
        # and clearly better than a plain bf16 rounding of the inputs
        bf = ms_deform_attn_pallas_hat(v.astype(jnp.bfloat16), shapes,
                                       loc, w, interpret=True)
        err_split = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
        err_bf16 = float(np.abs(np.asarray(bf).astype(np.float32)
                                - np.asarray(ref)).max())
        assert err_split < err_bf16 / 4

    def test_query_padding(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng, Lq=300)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_out_of_bounds_zero_padding(self, rng):
        """grid_sample zeros semantics: OOB corners contribute nothing,
        straddling samples keep only the in-bounds corner weights."""
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        loc = jnp.full_like(loc, 7.0)  # far outside every level
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_level_boundary_isolation(self, rng):
        """A sample at the bottom edge of level 0 must not bleed into
        level 1's first rows through the flattened token axis."""
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        # y just below the last row center of each level
        loc = loc.at[..., 1].set(0.999)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gating(self, rng):
        """CPU + f32 values must not select the kernel."""
        from dfvod_tpu.ops import msda_pallas
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        assert not msda_pallas.hat_supported(v, shapes)  # f32
        assert not msda_pallas.hat_supported(
            v.astype(jnp.bfloat16), shapes)  # CPU platform


class TestHatSparseKernel:
    """Chunk-skipping hat variant (opt-in; see ms_deform_attn_pallas_hat).
    The skip logic is conservative so output must be bit-equal in intent
    to the dense kernel for finite inputs."""

    def test_interpret_parity_multilevel(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True,
                                        sparse=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_token_chunk_padding(self, rng):
        """S not a multiple of the 256-token chunk: padded tokens sit
        outside every hat support and must contribute nothing."""
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(rng, shapes=((13, 27),), Lq=65)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat(v, shapes, loc, w, interpret=True,
                                        sparse=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_localized_samples_match_dense(self, rng):
        """The favorable case — tightly clustered sample points (most
        chunks inactive) — still matches the dense kernel exactly.
        bf16 values: in f32 the dense kernel now takes the
        split-precision path while the sparse variant keeps a single f32
        dot, so only the bf16 routes are bit-comparable."""
        import jax.numpy as jnp
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat
        v, loc, w, shapes = make_inputs(
            rng, B=1, M=2, D=16, P=4, shapes=((24, 32),), Lq=64)
        v = v.astype(jnp.bfloat16)
        loc = 0.05 + 0.02 * loc  # all samples in a tiny top-left region
        dense = ms_deform_attn_pallas_hat(v, shapes, loc, w,
                                          interpret=True, sparse=False)
        sparse = ms_deform_attn_pallas_hat(v, shapes, loc, w,
                                           interpret=True, sparse=True)
        np.testing.assert_allclose(
            np.asarray(sparse).astype(np.float32),
            np.asarray(dense).astype(np.float32), atol=1e-6, rtol=1e-6)


class TestHatTiledKernel:
    """Factored W-build variant (kept for future toolchains; measured
    slower than dense on 2026-08 Mosaic — lane concat cost)."""

    def test_interpret_parity_single_level(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_tiled
        v, loc, w, shapes = make_inputs(rng, shapes=((6, 9),), Lq=41)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat_tiled(v, shapes, loc, w,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestHatSepKernel:
    """Two-stage separable variant (x/y contractions via constant E/F
    expansion matmuls); measured parity with the dense hat kernel on
    2026-08 Mosaic (2.47 vs 2.41 ms at B=8) — kept for toolchains with
    cheaper small-k matmuls."""

    def test_interpret_parity_single_level(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_sep
        v, loc, w, shapes = make_inputs(rng, shapes=((6, 9),), Lq=41)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_hat_sep(v, shapes, loc, w,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_oob_zero(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_sep
        v, loc, w, shapes = make_inputs(rng, shapes=((6, 9),), Lq=8)
        loc = jnp.full_like(loc, 7.0)
        out = ms_deform_attn_pallas_hat_sep(v, shapes, loc, w,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestHatBackwardKernel:
    """Pallas hat backward (all-MXU col2im) vs XLA autodiff of the flat
    path — the production gradient oracle."""

    def _grads(self, rng, **kw):
        from dfvod_tpu.ops.msda import ms_deform_attn_flat
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_bwd
        v, loc, w, shapes = make_inputs(rng, **kw)
        go = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (v.shape[0], loc.shape[1],
                 v.shape[2] * v.shape[3])), jnp.float32)

        def fwd(v, l, a):
            return ms_deform_attn_flat(v, shapes, l, a)

        _, vjp = jax.vjp(fwd, v, loc, w)
        ref = vjp(go)
        got = ms_deform_attn_pallas_hat_bwd(v, shapes, loc, w, go,
                                            interpret=True)
        return got, ref

    def test_grad_parity_multilevel(self, rng):
        got, ref = self._grads(rng)
        for g, r, name in zip(got, ref, ("value", "loc", "attw")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4,
                err_msg=f"grad_{name}")

    def test_grad_parity_query_padding(self, rng):
        got, ref = self._grads(rng, Lq=300)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)

    def test_oob_samples_zero_grads(self, rng):
        """Fully OOB samples: zero gradient to value and locations, like
        the CUDA backward's OOB guard."""
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_bwd
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        loc = jnp.full_like(loc, 7.0)
        go = jnp.ones((v.shape[0], 8, v.shape[2] * v.shape[3]),
                      jnp.float32)
        gv, gl, ga = ms_deform_attn_pallas_hat_bwd(v, shapes, loc, w, go,
                                                   interpret=True)
        np.testing.assert_allclose(np.asarray(gv), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gl), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ga), 0.0, atol=1e-6)

    def test_deriv_variants_agree(self, rng):
        """The MXU-derivative variant (indicator-matmul gaw/gpx/gpy,
        ``_msda_hat_bwd_mxu_kernel_factory``) must match the VPU
        lane-reduction variant — the contraction against the constant
        0/1 column/row indicator matrices is an exact identity."""
        from dfvod_tpu.ops.msda import ms_deform_attn_flat
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_hat_bwd
        v, loc, w, shapes = make_inputs(rng, Lq=37)
        go = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (v.shape[0], 37, v.shape[2] * v.shape[3])), jnp.float32)

        _, vjp = jax.vjp(
            lambda v_, l_, a_: ms_deform_attn_flat(v_, shapes, l_, a_),
            v, loc, w)
        ref = vjp(go)
        for deriv in ("vpu", "mxu"):
            got = ms_deform_attn_pallas_hat_bwd(
                v, shapes, loc, w, go, interpret=True, deriv=deriv)
            for g, r, name in zip(got, ref, ("value", "loc", "attw")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4,
                    err_msg=f"{deriv} grad_{name}")

    def test_mxu_vmem_fallback(self, rng, monkeypatch):
        """'auto' must fall back to the VPU variant when the indicator
        matrices exceed the VMEM budget (large multi-level geometry)."""
        from dfvod_tpu.ops import msda_pallas
        calls = {}
        orig = msda_pallas._msda_hat_bwd_kernel_factory

        def spy(nQ):
            calls["vpu"] = True
            return orig(nQ)

        monkeypatch.setattr(
            msda_pallas, "_msda_hat_bwd_kernel_factory", spy)
        # (H, W) = (120, 160): S*(Wx+Ty)*4 = 19200*282*4 > 4 MiB
        shapes = ((120, 160),)
        S = 120 * 160
        v = jnp.asarray(rng.standard_normal((1, S, 1, 8)), jnp.float32)
        loc = jnp.asarray(rng.uniform(0, 1, (1, 4, 1, 1, 2, 2)),
                          jnp.float32)
        w = jnp.full((1, 4, 1, 1, 2), 0.5, jnp.float32)
        go = jnp.ones((1, 4, 8), jnp.float32)
        msda_pallas.ms_deform_attn_pallas_hat_bwd(
            v, shapes, loc, w, go, interpret=True, deriv="auto")
        assert calls.get("vpu"), "expected fallback to the VPU variant"


class TestOnehotKernel:
    def test_interpret_parity(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_onehot
        v, loc, w, shapes = make_inputs(rng)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_onehot(v, shapes, loc, w,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_query_padding(self, rng):
        from dfvod_tpu.ops.msda_pallas import ms_deform_attn_pallas_onehot
        v, loc, w, shapes = make_inputs(rng, Lq=300)
        ref = ms_deform_attn_xla(v, shapes, loc, w)
        out = ms_deform_attn_pallas_onehot(v, shapes, loc, w,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gating(self, rng):
        """CPU + f32 values must not select the kernel."""
        import jax.numpy as jnp
        from dfvod_tpu.ops import msda_pallas
        v, loc, w, shapes = make_inputs(rng, Lq=8)
        assert not msda_pallas.onehot_supported(v, shapes)  # f32
        assert not msda_pallas.onehot_supported(
            v.astype(jnp.bfloat16), shapes)  # CPU platform
