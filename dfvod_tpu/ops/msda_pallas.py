"""Pallas TPU kernels for multi-scale deformable attention (forward).

Replaces the CUDA ``ms_deformable_im2col_gpu_kernel``
(``/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299``)
with a TPU-shaped split: the *coordinate* math (bilinear corner indices +
fused corner x attention x validity weights) is cheap VPU work done as
plain XLA in the wrapper; the kernel handles the memory-bound sampling,
keeping each head's full ``(S, D)`` value slab **VMEM-resident** across
all query blocks of the grid's inner axis (a few hundred KB for the
production stride-16 configs). Two strategies:

- ``ms_deform_attn_pallas_onehot`` — the **production kernel** (bf16
  serving mode): per (batch*head, query-block) program, builds the sparse
  interpolation matrix ``W (TQ, S)`` with K statically-unrolled
  iota-compare fmas on the VPU and contracts it against the value slab on
  the MXU. No gathers at all — the irregular access pattern becomes a
  dense matmul. Measured 0.41/3.9 ms (B=1/8) vs 0.58/5.3 ms for the best
  XLA formulation at the 38x50/8-head encoder shape. NB the in-kernel MXU
  runs bf16 passes regardless of preferred_element_type on this
  toolchain, so this kernel is gated to bf16-tolerant callers (value
  dtype bf16).
- ``ms_deform_attn_pallas`` — the row-gather variant (Mosaic
  ``dynamic_gather``); correct but the gather lowering is slow on the
  2026-08 axon toolchain. Kept for toolchains with fast gathers.

Backward reuses the XLA path's autodiff (``msda.py`` wires a custom_vjp
whose forward is the kernel and whose backward is XLA's VJP); the forward
is what the inference north-star needs.

``supported()``/``onehot_supported()`` probe compile + numerics once per
process. Force with ``DFVOD_MSDA_IMPL=xla|flat|pallas|pallas_onehot``.
"""
from __future__ import annotations

import functools
import os
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfvod_tpu.ops.msda import corner_indices_weights

_TQ = 256   # query block (sublane-friendly), row-gather kernel
_TQ_OH = 128  # query block, one-hot kernel (W tile = TQ x S f32 in VMEM)


def _onehot_kernel(iota_ref, idx_ref, w_ref, value_ref, out_ref):
    """One (batch*head, query-block) program: W build (VPU) + matmul (MXU).

    iota_ref: (1, S) int32 (arange, an input so the kernel captures no
    constants — required for the compile-time-eval probe);
    idx_ref/w_ref: (1, TQ, K); value_ref: (1, S, D); out_ref: (1, TQ, D).
    """
    iota = iota_ref[...]                           # (1, S)
    idx = idx_ref[0]
    w = w_ref[0]
    v = value_ref[0]
    K = idx.shape[1]
    W = w[:, 0:1] * (iota == idx[:, 0:1]).astype(jnp.float32)
    for k in range(1, K):  # static unroll: K = L*P*4 (16 in production)
        W = W + w[:, k:k + 1] * (iota == idx[:, k:k + 1]).astype(
            jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        W, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def onehot_sample(v_bm, idx_bm, w_bm, interpret: bool = False):
    """Generic gather-free weighted sampling: out[b, q] = sum_k
    w[b, q, k] * v[b, idx[b, q, k]] via the one-hot kernel.

    v_bm (BM, S, D); idx_bm/w_bm (BM, Lq, K). Returns (BM, Lq, D).
    Used by MSDA (K = L*P*4 corners) and RoIAlign (K = 4 corners per
    sample point).
    """
    BM, S, D = v_bm.shape
    _, Lq, K = idx_bm.shape
    Lq_pad = -(-Lq // _TQ_OH) * _TQ_OH
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        idx_bm = jnp.pad(idx_bm, pad)
        w_bm = jnp.pad(w_bm, pad)
    iota = jnp.arange(S, dtype=jnp.int32)[None]
    out = pl.pallas_call(
        _onehot_kernel,
        grid=(BM, Lq_pad // _TQ_OH),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ_OH, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ_OH, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TQ_OH, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), v_bm.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BM * Lq_pad * S * D + 2 * BM * Lq_pad * K * S,
            bytes_accessed=BM * (S * D * v_bm.dtype.itemsize
                                 + Lq_pad * K * 8),
            transcendentals=0),
    )(iota, idx_bm, w_bm, v_bm)
    return out[:, :Lq]


def _hat_kernel(sx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
                out_ref):
    """One (batch*head, query-block) program — separable-hat W build.

    Bilinear interpolation weight of token (sy, sx) for a sample at
    (py, px) is ``relu(1 - |px - sx|) * relu(1 - |py - sy|)`` — the 2-D
    tent function. This replaces the 4-corners-per-point one-hot build
    (K = 4*L*P iota compares, ``_onehot_kernel``) with L*P hat products
    (~11 VPU ops per point instead of ~16 int-compare+convert+fma), and
    reproduces ``grid_sample(padding_mode='zeros')`` exactly: an
    out-of-bounds corner simply has no token whose coordinate matches,
    so its contribution never materializes (the CUDA kernel's explicit
    OOB zeroing, ``ms_deform_im2col_cuda.cuh:33-86``).

    sx_ref/sy_ref: (1, S) f32 token coordinates (y carries a per-level
    offset so hats cannot straddle level boundaries); px/py/aw:
    (1, TQ, PL) f32 sample coords and folded attention weights;
    value_ref: (1, S, D); out_ref: (1, TQ, D).
    """
    sx = sx_ref[...]                               # (1, S)
    sy = sy_ref[...]
    px = px_ref[0]                                 # (TQ, PL)
    py = py_ref[0]
    aw = aw_ref[0]
    v = value_ref[0]
    PL = px.shape[1]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, 0:1] - sx))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, 0:1] - sy))
    W = (aw[:, 0:1] * hx) * hy
    for p in range(1, PL):  # static unroll: PL = L*P (4 in production)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, p:p + 1] - sx))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, p:p + 1] - sy))
        W = W + (aw[:, p:p + 1] * hx) * hy
    out_ref[0] = jax.lax.dot_general(
        W, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _hat_coords(spatial_shapes):
    """Per-token (sx, sy) f32 coordinates with level-offset y (numpy)."""
    import numpy as np
    sxs, sys_ = [], []
    y_off = 0.0
    for H, W in spatial_shapes:
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        sxs.append(xx.reshape(-1))
        sys_.append(yy.reshape(-1) + y_off)
        y_off += H + 2.0  # +2 so no hat (support width 1) can straddle
    return np.concatenate(sxs), np.concatenate(sys_)


def hat_sample(v_bm, sx, sy, px_bm, py_bm, aw_bm,
               interpret: bool = False, block_q: int = _TQ_OH):
    """Generic gather-free weighted bilinear sampling via hat products:
    ``out[b, q] = sum_p aw[b, q, p] * bilinear(v[b], py[b,q,p], px[b,q,p])``
    where token coordinates are ``(sy[s], sx[s])``.

    v_bm (BM, S, D); sx/sy (S,) f32; px/py/aw (BM, Lq, PL) f32.
    Returns (BM, Lq, D). Callers encode their boundary semantics in the
    coords/weights (MSDA: zeros padding falls out of the hat support;
    RoIAlign: pre-clamped coords + validity-masked weights).
    """
    BM, S, D = v_bm.shape
    _, Lq, PL = px_bm.shape
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        # pad samples far outside every hat's support so they contribute 0
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    out = pl.pallas_call(
        _hat_kernel,
        grid=(BM, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), v_bm.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BM * Lq_pad * S * D + 11 * BM * Lq_pad * PL * S,
            bytes_accessed=BM * (S * D * v_bm.dtype.itemsize
                                 + Lq_pad * PL * 12),
            transcendentals=0),
    )(sx[None], sy[None], px_bm, py_bm, aw_bm, v_bm)
    return out[:, :Lq]


def ms_deform_attn_pallas_hat(value, spatial_shapes, sampling_locations,
                              attention_weights, interpret: bool = False,
                              block_q: int = _TQ_OH):
    """Gather-free MSDA via separable hat products (see ``_hat_kernel``)."""
    spatial_shapes = tuple(spatial_shapes)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    PL = L * P

    loc = sampling_locations.astype(jnp.float32)
    aw = attention_weights.astype(jnp.float32)
    pxs, pys = [], []
    y_off = 0.0
    for l, (H, W) in enumerate(spatial_shapes):
        pxs.append(loc[:, :, :, l, :, 0] * W - 0.5)
        pys.append(loc[:, :, :, l, :, 1] * H - 0.5 + y_off)
        y_off += H + 2.0
    px = jnp.concatenate(pxs, -1)                  # (B, Lq, M, PL)
    py = jnp.concatenate(pys, -1)
    aw = aw.reshape(B, Lq, M, PL)

    px_bm = px.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    py_bm = py.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    aw_bm = aw.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    sx_np, sy_np = _hat_coords(spatial_shapes)
    out = hat_sample(v_bm, jnp.asarray(sx_np), jnp.asarray(sy_np),
                     px_bm, py_bm, aw_bm, interpret=interpret,
                     block_q=block_q)
    out = out.reshape(B, M, Lq, D)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def ms_deform_attn_pallas_onehot(value, spatial_shapes, sampling_locations,
                                 attention_weights,
                                 interpret: bool = False):
    """Gather-free MSDA: interpolation-matrix x value matmul in VMEM."""
    spatial_shapes = tuple(spatial_shapes)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    K = L * P * 4
    idx, w = corner_indices_weights(spatial_shapes, sampling_locations,
                                    attention_weights)
    Lq_pad = -(-Lq // _TQ_OH) * _TQ_OH
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0))
        idx = jnp.pad(idx, pad)
        w = jnp.pad(w, pad)
    idx_bm = idx.transpose(0, 2, 1, 3).reshape(B * M, Lq_pad, K)
    w_bm = w.transpose(0, 2, 1, 3).reshape(B * M, Lq_pad, K)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    iota = jnp.arange(S, dtype=jnp.int32)[None]
    out = pl.pallas_call(
        _onehot_kernel,
        grid=(B * M, Lq_pad // _TQ_OH),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ_OH, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ_OH, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TQ_OH, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Lq_pad * S * D
            + 2 * B * M * Lq_pad * K * S,
            bytes_accessed=B * M * (S * D * value.dtype.itemsize
                                    + Lq_pad * K * 8),
            transcendentals=0),
    )(iota, idx_bm, w_bm, v_bm)
    out = out.reshape(B, M, Lq_pad, D)[:, :, :Lq]
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def _run_outside_trace(fn):
    """Execute ``fn`` eagerly even when the caller is inside a jit trace:
    JAX trace state is thread-local, so a fresh thread runs eagerly."""
    import threading
    box = {}

    def run():
        try:
            box["out"] = fn()
        except Exception as e:  # propagate as value
            box["err"] = e

    t = threading.Thread(target=run)
    t.start()
    t.join()
    if "err" in box:
        raise box["err"]
    return box["out"]


@functools.lru_cache(maxsize=1)
def _hat_probe() -> bool:
    """Compile + bf16-tolerance numerics probe for the hat kernel."""
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
        import numpy as np
        from dfvod_tpu.ops.msda import ms_deform_attn_xla
        rng = np.random.default_rng(0)
        shapes = ((8, 16),)
        v = np.asarray(rng.standard_normal((1, 128, 2, 8)), np.float32)
        loc = np.asarray(rng.uniform(0, 1, (1, 4, 2, 1, 2, 2)),
                         np.float32)
        attw = np.full((1, 4, 2, 1, 2), 0.25, np.float32)

        def body():
            got = np.asarray(ms_deform_attn_pallas_hat(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
            ref = np.asarray(ms_deform_attn_xla(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
            return got, ref

        got, ref = _run_outside_trace(body)
        ok = bool(np.allclose(got, ref, atol=3e-2))  # bf16 MXU tolerance
        if not ok:
            print("[msda_pallas] hat probe MISCOMPILED; one-hot/XLA path")
        return ok
    except Exception as e:
        print(f"[msda_pallas] hat probe failed ({type(e).__name__});"
              " one-hot/XLA path")
        return False


def hat_supported(value, spatial_shapes) -> bool:
    """Production gate for the hat kernel — same constraints as the
    one-hot kernel (bf16 values, W-tile + value-slab VMEM budget) plus
    its own compile/numerics probe. The hat build is ~1.5x faster than
    the one-hot build (2.18 vs 3.36 ms at the B=8 encoder shape)."""
    if value.dtype != jnp.bfloat16:
        return False
    S, D = value.shape[1], value.shape[3]
    vmem = S * max(D, 128) * 2 + _TQ_OH * S * 4
    if vmem > 8 * 1024 * 1024:
        return False
    return _hat_probe()


@functools.lru_cache(maxsize=1)
def _onehot_probe() -> bool:
    """Compile + bf16-tolerance numerics probe for the one-hot kernel."""
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
        import numpy as np
        from dfvod_tpu.ops.msda import ms_deform_attn_xla
        rng = np.random.default_rng(0)
        shapes = ((8, 16),)
        v = np.asarray(rng.standard_normal((1, 128, 2, 8)), np.float32)
        loc = np.asarray(rng.uniform(0, 1, (1, 4, 2, 1, 2, 2)),
                         np.float32)
        attw = np.full((1, 4, 2, 1, 2), 0.25, np.float32)

        def body():
            got = np.asarray(ms_deform_attn_pallas_onehot(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
            ref = np.asarray(ms_deform_attn_xla(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
            return got, ref

        got, ref = _run_outside_trace(body)
        ok = bool(np.allclose(got, ref, atol=3e-2))  # bf16 MXU tolerance
        if not ok:
            print("[msda_pallas] one-hot probe MISCOMPILED; XLA path")
        return ok
    except Exception as e:
        print(f"[msda_pallas] one-hot probe failed ({type(e).__name__});"
              " XLA path")
        return False


def onehot_supported(value, spatial_shapes) -> bool:
    """Production gate for the one-hot kernel: bf16 values (the kernel's
    MXU precision), VMEM budget for the value slab + W tile, and the
    compile/numerics probe."""
    if value.dtype != jnp.bfloat16:
        return False
    S, D = value.shape[1], value.shape[3]
    vmem = S * max(D, 128) * 2 + _TQ_OH * S * 4
    if vmem > 8 * 1024 * 1024:
        return False
    return _onehot_probe()


def _kernel(idx_ref, w_ref, value_ref, out_ref):
    """One (batch*head, query-block) program.

    idx_ref: (1, TQ, K) int32; w_ref: (1, TQ, K) f32;
    value_ref: (1, S, D); out_ref: (1, TQ, D).
    """
    v = value_ref[0]                               # (S, D)
    idx = idx_ref[0]                               # (TQ, K)
    w = w_ref[0]                                   # (TQ, K)
    TQ, K = idx.shape
    D = v.shape[-1]
    g = jnp.take(v, idx.reshape(-1), axis=0, fill_value=0.0)
    g = g.reshape(TQ, K, D).astype(jnp.float32)
    acc = jnp.einsum("qk,qkd->qd", w, g,
                     preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights, interpret: bool = False):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    K = L * P * 4

    idx, w = corner_indices_weights(spatial_shapes, sampling_locations,
                                    attention_weights)
    Lq_pad = -(-Lq // _TQ) * _TQ
    if Lq_pad != Lq:
        idx = jnp.pad(idx, ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0)))

    # per-(b, m) layout: last two dims full-sized or tile-aligned
    idx_bm = idx.transpose(0, 2, 1, 3).reshape(B * M, Lq_pad, K)
    w_bm = w.transpose(0, 2, 1, 3).reshape(B * M, Lq_pad, K)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)

    grid = (B * M, Lq_pad // _TQ)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TQ, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ, K), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TQ, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Lq_pad * K * D,
            bytes_accessed=(B * M * S * D * value.dtype.itemsize
                            + B * M * Lq_pad * K * 8),
            transcendentals=0),
    )(idx_bm, w_bm, v_bm)

    out = out.reshape(B, M, Lq_pad, D)[:, :, :Lq]
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, interpret: bool = False):
    """Forward-only Pallas MSDA; gradients come from the XLA path's VJP
    (wired in ``msda.py``)."""
    return _pallas_forward(value, tuple(spatial_shapes),
                           sampling_locations, attention_weights,
                           interpret=interpret)


@functools.lru_cache(maxsize=1)
def _probe() -> bool:
    """Does the kernel compile AND compute correctly on this backend?

    The probe checks numerics against the XLA oracle, not just compilation:
    the 2026-08 axon remote-compile Mosaic toolchain either rejects
    in-kernel row gathers ("Shape mismatch in input, indices and output")
    or miscompiles gather-like patterns (iota-one-hot matmuls replicate
    lane 0), so compile success alone is not trust-worthy.
    """
    try:
        import jax.extend.backend
        platform = jax.extend.backend.get_backend().platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    try:
        import numpy as np
        from dfvod_tpu.ops.msda import ms_deform_attn_xla
        rng = np.random.default_rng(0)
        shapes = ((8, 16),)
        v = np.asarray(rng.standard_normal((1, 128, 2, 8)), np.float32)
        loc = np.asarray(rng.uniform(0, 1, (1, 4, 2, 1, 2, 2)), np.float32)
        attw = np.full((1, 4, 2, 1, 2), 0.25, np.float32)
        # the probe may fire from inside a jit trace (supported() is
        # called in the dispatch); force concrete evaluation
        with jax.ensure_compile_time_eval():
            got = np.asarray(_pallas_forward(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
            ref = np.asarray(ms_deform_attn_xla(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw)))
        ok = bool(np.allclose(got, ref, atol=1e-4))
        if not ok:
            print("[msda_pallas] probe MISCOMPILED, using XLA path")
        return ok
    except Exception as e:  # Mosaic lowering not available
        print(f"[msda_pallas] probe failed, using XLA path: "
              f"{type(e).__name__}")
        return False


def supported(value, spatial_shapes, sampling_locations) -> bool:
    """Whether the dispatch should pick the Pallas kernel.

    Measured on the 2026-08 axon toolchain: the kernel compiles and is
    numerically correct, but Mosaic lowers the in-kernel row gather ~40x
    slower than XLA's native gather lowering (bench: 47 vs 2055 frames/s
    end-to-end), so the XLA path is the production default and Pallas is
    explicit opt-in (``DFVOD_MSDA_IMPL=pallas``) for toolchains with a
    fast ``dynamic_gather``. The opt-in still runs the correctness probe.
    """
    # VMEM budget: the (S, D) slab (lane-padded to 128) must fit
    S, D = value.shape[1], value.shape[3]
    if S * max(D, 128) * value.dtype.itemsize > 8 * 1024 * 1024:
        return False
    return _probe()
