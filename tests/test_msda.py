"""MSDA kernel parity + gradient tests.

Mirrors the reference test strategy (``/root/reference/models/ops/test.py``):
forward parity against a grid_sample-based oracle (torch CPU, test-only) in
double and float, plus jacobian checks across odd/even channel counts.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvod_tpu.ops import ms_deform_attn, ms_deform_attn_xla


def torch_oracle(value, spatial_shapes, loc, attw):
    """grid_sample-based MSDA oracle (same math as the reference's pure-torch
    debug path, ``ms_deform_attn_func.py:41-61``), written against torch CPU
    for test-time parity only."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    attw = torch.from_numpy(attw)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    splits = [h * w for h, w in spatial_shapes]
    vals = value.split(splits, dim=1)
    grids = 2 * loc - 1
    sampled = []
    for l, (H, W) in enumerate(spatial_shapes):
        v = vals[l].flatten(2).transpose(1, 2).reshape(B * M, D, H, W)
        g = grids[:, :, :, l].transpose(1, 2).flatten(0, 1)  # (B*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s)  # (B*M, D, Lq, P)
    attw_t = attw.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attw_t).sum(-1)
    return out.view(B, M * D, Lq).transpose(1, 2).contiguous().numpy()


def make_inputs(rng, B=2, M=4, D=8, Lq=13, P=3,
                spatial_shapes=((6, 9), (4, 5)), dtype=np.float64):
    L = len(spatial_shapes)
    S = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((B, S, M, D)).astype(dtype)
    # locations mostly inside, some outside [0,1] to exercise zero-padding
    loc = (rng.random((B, Lq, M, L, P, 2)) * 1.4 - 0.2).astype(dtype)
    attw = rng.random((B, Lq, M, L, P)).astype(dtype) + 1e-3
    attw = attw / attw.sum(axis=(-1, -2), keepdims=True)
    return value, loc, attw


@pytest.mark.parametrize("dtype,tol", [(np.float64, 1e-12), (np.float32, 1e-5)])
def test_forward_parity_with_grid_sample(rng, dtype, tol):
    shapes = ((6, 9), (4, 5))
    value, loc, attw = make_inputs(rng, spatial_shapes=shapes, dtype=dtype)
    expected = torch_oracle(value, shapes, loc, attw)
    got = np.asarray(ms_deform_attn_xla(value, shapes, loc, attw))
    np.testing.assert_allclose(got, expected, rtol=tol, atol=tol)


@pytest.mark.parametrize("D", [5, 8, 30, 32, 71])
def test_forward_parity_channels(rng, D):
    shapes = ((5, 7),)
    value, loc, attw = make_inputs(rng, D=D, spatial_shapes=shapes,
                                   dtype=np.float64)
    expected = torch_oracle(value, shapes, loc, attw)
    got = np.asarray(ms_deform_attn_xla(value, shapes, loc, attw))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_single_query_center_sample(rng):
    """A sample exactly at a pixel center returns that pixel's value."""
    H, W, M, D = 4, 4, 1, 2
    value = rng.standard_normal((1, H * W, M, D))
    # pixel (row=1, col=2): normalized center = ((2+0.5)/W, (1+0.5)/H)
    loc = np.array([(2 + 0.5) / W, (1 + 0.5) / H]).reshape(1, 1, 1, 1, 1, 2)
    attw = np.ones((1, 1, 1, 1, 1))
    out = np.asarray(ms_deform_attn_xla(value, ((H, W),), loc, attw))
    np.testing.assert_allclose(out[0, 0], value[0, 1 * W + 2, 0], rtol=1e-6)


def test_out_of_bounds_is_zero():
    value = np.ones((1, 12, 1, 4))
    loc = np.full((1, 1, 1, 1, 1, 2), -0.8)  # far outside
    attw = np.ones((1, 1, 1, 1, 1))
    out = np.asarray(ms_deform_attn_xla(value, ((3, 4),), loc, attw))
    np.testing.assert_allclose(out, 0.0)


def test_gradients_match_numerical(rng):
    shapes = ((5, 6),)
    value, loc, attw = make_inputs(rng, B=1, M=2, D=3, Lq=4, P=2,
                                   spatial_shapes=shapes, dtype=np.float64)

    @jax.jit
    def f(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_xla(v, shapes, l, a)))

    grads = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(value, loc, attw)
    eps = 1e-6
    for argi, arg in enumerate((value, loc, attw)):
        g = np.asarray(grads[argi])
        flat = arg.reshape(-1)
        for k in rng.choice(flat.size, size=8, replace=False):
            pert_p = flat.copy()
            pert_p[k] += eps
            pert_m = flat.copy()
            pert_m[k] -= eps
            args_p = [value, loc, attw]
            args_p[argi] = pert_p.reshape(arg.shape)
            args_m = [value, loc, attw]
            args_m[argi] = pert_m.reshape(arg.shape)
            num = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[k], num, rtol=1e-4,
                                       atol=1e-6)


def test_jit_and_vmap_compose(rng):
    shapes = ((4, 4),)
    value, loc, attw = make_inputs(rng, B=3, spatial_shapes=shapes,
                                   dtype=np.float32)
    out1 = ms_deform_attn(value, shapes, loc, attw)
    f = jax.vmap(lambda v, l, a: ms_deform_attn_xla(v[None], shapes, l[None],
                                                    a[None])[0])
    out2 = f(value, loc, attw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5,
                               atol=1e-5)
