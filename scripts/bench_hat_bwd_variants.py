"""Tuning experiments for the MSDA hat backward kernel (B=8 enc shape).

Variants:
  - block_q 128 / 256 / 512 on the shipped kernel
  - 'trim' kernel: shared T=hx*hy product, sign folded out of the inner
    (TQ,S) arrays (negate applied on the small (TQ,PL) outputs), G*hx /
    G*hy factor reuse
Parity-checked against the shipped kernel before timing.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfvod_tpu.ops import msda_pallas
from dfvod_tpu.ops.msda_pallas import hat_sample_bwd

B, S, D = 8, 1900, 32
M, PL = 8, 4
BM = B * M
Lq = 1900
FH, FW = 38, 50


def rpc_cost():
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(fn, args, iters=30, reps=3):
    def body(i, c):
        out = fn(*[a + c if a.dtype != jnp.float32 else a + c.astype(a.dtype)
                   for a in args[:1]], *args[1:])
        s = sum(jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(out))
        return (jnp.tanh(s) * 1e-6).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))
    best = np.inf
    for _ in range(reps):
        rpc = rpc_cost()
        t0 = time.perf_counter()
        float(loop(jnp.bfloat16(0.0), jnp.int32(iters)))
        best = min(best, (time.perf_counter() - t0 - rpc) / iters)
    return best


def _trim_bwd_kernel(sx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
                     go_ref, gv_ref, gpx_ref, gpy_ref, gaw_ref):
    q = pl.program_id(1)
    sx = sx_ref[...]
    sy = sy_ref[...]
    px = px_ref[0]
    py = py_ref[0]
    aw = aw_ref[0]
    v = value_ref[0]
    go = go_ref[0].astype(jnp.float32)
    G = jax.lax.dot_general(
        go, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    npts = px.shape[1]
    gaw_cols, gpx_cols, gpy_cols = [], [], []
    W = None
    for p in range(npts):
        dx = px[:, p:p + 1] - sx
        dy = py[:, p:p + 1] - sy
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
        # unsigned tent derivative magnitude carrier: sign(dx) where the
        # hat is live, 0 outside; the global minus sign is applied on the
        # small (TQ,) outputs instead of the (TQ, S) arrays
        dhxu = jnp.where(hx > 0.0, jnp.sign(dx), 0.0)
        dhyu = jnp.where(hy > 0.0, jnp.sign(dy), 0.0)
        T = hx * hy
        Ghy = G * hy
        Ghx = G * hx
        gaw_cols.append(jnp.sum(T * G, axis=1))
        gpx_cols.append(-aw[:, p] * jnp.sum(dhxu * Ghy, axis=1))
        gpy_cols.append(-aw[:, p] * jnp.sum(dhyu * Ghx, axis=1))
        Wp = aw[:, p:p + 1] * T
        W = Wp if W is None else W + Wp
    gaw_ref[0] = jnp.stack(gaw_cols, axis=1)
    gpx_ref[0] = jnp.stack(gpx_cols, axis=1)
    gpy_ref[0] = jnp.stack(gpy_cols, axis=1)
    gv = jax.lax.dot_general(
        W, go, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    gv_ref[0] += gv


def _eqdiff_bwd_kernel(sx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
                       go_ref, gv_ref, gpx_ref, gpy_ref, gaw_ref):
    """Location gradients via integer-point sample differences.

    d/dpx of the bilinear sample is (sample at x=ceil) - (sample at
    x=floor); a hat evaluated at an integer point is an equality
    indicator, so the tent-derivative sign/select chain collapses to two
    eq-compares per axis. This is also exactly the CUDA col2im
    convention (one-sided derivative at integer px), where the shipped
    kernel used the subgradient-0 convention.
    """
    q = pl.program_id(1)
    sx = sx_ref[...]
    sy = sy_ref[...]
    px = px_ref[0]
    py = py_ref[0]
    aw = aw_ref[0]
    v = value_ref[0]
    go = go_ref[0].astype(jnp.float32)
    G = jax.lax.dot_general(
        go, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pxf = jnp.floor(px)                            # (TQ, PL) — tiny
    pyf = jnp.floor(py)
    gaw_cols, gpx_cols, gpy_cols = [], [], []
    W = None
    for p in range(PL):
        dx = px[:, p:p + 1] - sx
        dy = py[:, p:p + 1] - sy
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
        Ghy = G * hy
        Ghx = G * hx
        gaw_cols.append(jnp.sum(hx * Ghy, axis=1))
        cx = ((sx == pxf[:, p:p + 1] + 1.0).astype(jnp.float32)
              - (sx == pxf[:, p:p + 1]).astype(jnp.float32))
        cy = ((sy == pyf[:, p:p + 1] + 1.0).astype(jnp.float32)
              - (sy == pyf[:, p:p + 1]).astype(jnp.float32))
        gpx_cols.append(aw[:, p] * jnp.sum(cx * Ghy, axis=1))
        gpy_cols.append(aw[:, p] * jnp.sum(cy * Ghx, axis=1))
        Wp = (aw[:, p:p + 1] * hx) * hy
        W = Wp if W is None else W + Wp
    gaw_ref[0] = jnp.stack(gaw_cols, axis=1)
    gpx_ref[0] = jnp.stack(gpx_cols, axis=1)
    gpy_ref[0] = jnp.stack(gpy_cols, axis=1)
    gv = jax.lax.dot_general(
        W, go, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    gv_ref[0] += gv


def _generic_bwd(kernel, v_bm, sx, sy, px_bm, py_bm, aw_bm, go_bm,
                 block_q=128):
    Lq_pad = -(-px_bm.shape[1] // block_q) * block_q
    if Lq_pad != px_bm.shape[1]:
        pad = ((0, 0), (0, Lq_pad - px_bm.shape[1]), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
        go_bm = jnp.pad(go_bm, pad)
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BM, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BM, S, D), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
        ],
    )(sx[None], sy[None], px_bm, py_bm, aw_bm, v_bm, go_bm)


def eqdiff_bwd(v_bm, sx, sy, px_bm, py_bm, aw_bm, go_bm, block_q=128):
    return _generic_bwd(_eqdiff_bwd_kernel, v_bm, sx, sy, px_bm, py_bm,
                        aw_bm, go_bm, block_q)


def trim_bwd(v_bm, sx, sy, px_bm, py_bm, aw_bm, go_bm, block_q=128):
    Lq_pad = -(-px_bm.shape[1] // block_q) * block_q
    if Lq_pad != px_bm.shape[1]:
        pad = ((0, 0), (0, Lq_pad - px_bm.shape[1]), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
        go_bm = jnp.pad(go_bm, pad)
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _trim_bwd_kernel,
        grid=(BM, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BM, S, D), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL), jnp.float32),
        ],
    )(sx[None], sy[None], px_bm, py_bm, aw_bm, v_bm, go_bm)


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((BM, S, D)), jnp.bfloat16)
    sx_np, sy_np = msda_pallas._hat_coords(((FH, FW),))
    sx = jnp.asarray(sx_np)
    sy = jnp.asarray(sy_np)
    px = jnp.asarray(rng.uniform(0, FW - 1, (BM, Lq, PL)), jnp.float32)
    py = jnp.asarray(rng.uniform(0, FH - 1, (BM, Lq, PL)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (BM, Lq, PL)), jnp.float32)
    go = jnp.asarray(rng.standard_normal((BM, Lq, D)), jnp.float32)

    # parity: trim vs shipped
    ref = jax.jit(functools.partial(hat_sample_bwd, block_q=128))(
        v, sx, sy, px, py, aw, go)
    got = jax.jit(functools.partial(trim_bwd, block_q=128))(
        v, sx, sy, px, py, aw, go)
    for name, r, g in zip(("gv", "gpx", "gpy", "gaw"), ref, got):
        g = g[:, :r.shape[1]]
        err = float(jnp.max(jnp.abs(r - g)))
        scale = float(jnp.max(jnp.abs(r))) or 1.0
        print(f"parity {name}: max abs err {err:.3e} (scale {scale:.1f})")
        # reassociated W build -> different bf16-MXU roundings (the
        # in-kernel MXU is bf16 on this toolchain regardless of
        # preferred_element_type, see PERF.md) — gate at bf16 scale
        assert err / scale < 3e-3, name

    got2 = jax.jit(functools.partial(eqdiff_bwd, block_q=128))(
        v, sx, sy, px, py, aw, go)
    # at exactly-integer sample coords the two kernels use different
    # (both valid) subgradient conventions: eqdiff = one-sided (the CUDA
    # col2im convention), shipped = 0 — compare off-grid entries only
    offgrid = ((px != jnp.floor(px)) & (py != jnp.floor(py)))
    for name, r, g in zip(("gv", "gpx", "gpy", "gaw"), ref, got2):
        g = g[:, :r.shape[1]]
        d = jnp.abs(r - g)
        if name in ("gpx", "gpy"):
            d = jnp.where(offgrid, d, 0.0)
        err = float(jnp.max(d))
        scale = float(jnp.max(jnp.abs(r))) or 1.0
        print(f"eqdiff parity {name}: max abs err {err:.3e} "
              f"(scale {scale:.1f})")
        assert err / scale < 3e-3, name

    for name, fn in (("shipped", hat_sample_bwd), ("trim", trim_bwd),
                     ("eqdiff", eqdiff_bwd)):
        for bq in (128, 256, 512):
            try:
                t = measure(jax.jit(functools.partial(fn, block_q=bq)),
                            (v, sx, sy, px, py, aw, go))
                print(f"{name:8s} block_q={bq:4d}: {t*1e3:7.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"{name:8s} block_q={bq:4d}: FAILED "
                      f"({str(e)[:90]})", flush=True)


if __name__ == "__main__":
    main()
