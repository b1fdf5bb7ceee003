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
import numpy as np
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


def _hat_tiled_kernel_factory(H, W):
    """Single-level hat kernel with a factored W build: on a (H, W) grid
    the tent weight separates as hx(col) * hy(row), and hx has only W
    distinct values per sample point (hy only H). Build hx on a (TQ, W)
    tile and hy on (TQ, H), then expand to (TQ, S=H*W) by lane tiling
    (hx: concat H copies; hy: broadcast+reshape repeat) instead of
    computing 11 VPU ops on all S columns — the build drops from
    ~11*S to ~11*(W+H) + ~3*S ops per point."""

    def kernel(wx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
               out_ref):
        wx = wx_ref[...]                           # (1, W)
        sy = sy_ref[...]                           # (1, S) row coord/token
        px = px_ref[0]                             # (TQ, PL)
        py = py_ref[0]
        aw = aw_ref[0]
        v = value_ref[0]
        TQ, PL = px.shape
        Wm = None
        for p in range(PL):  # static unroll: PL = L*P
            # hx has only W distinct values -> build small, tile H times
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, p:p + 1] - wx))
            hx_t = jnp.concatenate([hx] * H, axis=1)   # (TQ, S)
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, p:p + 1] - sy))
            Wp = (aw[:, p:p + 1] * hx_t) * hy
            Wm = Wp if Wm is None else Wm + Wp
        out_ref[0] = jax.lax.dot_general(
            Wm, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    return kernel


def ms_deform_attn_pallas_hat_tiled(value, spatial_shapes,
                                    sampling_locations, attention_weights,
                                    interpret: bool = False,
                                    block_q: int = _TQ_OH):
    """Single-level MSDA via the factored-build hat kernel."""
    spatial_shapes = tuple(spatial_shapes)
    assert len(spatial_shapes) == 1, "tiled hat kernel is single-level"
    H, W = spatial_shapes[0]
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    PL = L * P

    loc = sampling_locations.astype(jnp.float32)
    aw = attention_weights.astype(jnp.float32)
    px = loc[:, :, :, 0, :, 0] * W - 0.5           # (B, Lq, M, P)
    py = loc[:, :, :, 0, :, 1] * H - 0.5
    aw = aw.reshape(B, Lq, M, PL)

    px_bm = px.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    py_bm = py.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    aw_bm = aw.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    wx = jnp.arange(W, dtype=jnp.float32)[None]
    sy = jnp.asarray(
        np.repeat(np.arange(H, dtype=np.float32), W))[None]
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hat_tiled_kernel_factory(H, W),
        grid=(B * M, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, W), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Lq_pad * S * D
            + 5 * B * M * Lq_pad * PL * S,
            bytes_accessed=B * M * (S * D * value.dtype.itemsize
                                    + Lq_pad * PL * 12),
            transcendentals=0),
    )(wx, sy, px_bm, py_bm, aw_bm, v_bm)
    out = out.reshape(B, M, Lq_pad, D)[:, :, :Lq]
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def _hat_sep_kernel_factory(H, W, D, PL, TQ):
    """Single-level separable hat kernel — two-stage rank-1 contraction.

    On a (H, W) grid the tent weight separates: W[q,(y,x)] =
    sum_p aw_p hx_p(x) hy_p(y). Instead of building the dense (TQ, S)
    interpolation matrix with ~11 VPU ops per element (the dense hat
    kernel's bottleneck), contract x and y separately:

      U    = [hx_0; ...; hx_{PL-1}] @ Vt        (PL*TQ, H*D)   MXU
      Q    = sum_p (aw_p*hy_p @ E) * U_p        (TQ, H*D)      MXU+VPU
      out  = Q @ F                              (TQ, D)        MXU

    where Vt[x, y*D+d] = v[(y,x), d] is the x-major value slab and
    E (H, H*D) / F (H*D, D) are constant 0/1 expansion/reduction
    matrices (E[y, y*D+d]=1 repeats each hy entry D times along lanes;
    F[y*D+d, d]=1 sums lane groups of stride D). Every op is a matmul
    or an elementwise multiply on well-formed tiles — no lane
    concats/reshapes (the failure mode of the tiled build).
    VPU work drops from ~11*PL*TQ*S to ~11*PL*TQ*(W+H) + 2*PL*TQ*H*D.
    """

    def kernel(wx_ref, wy_ref, px_ref, py_ref, aw_ref, vt_ref, e_ref,
               f_ref, out_ref):
        wx = wx_ref[...]                           # (1, W)
        wy = wy_ref[...]                           # (1, H)
        px = px_ref[0]                             # (TQ, PL)
        py = py_ref[0]
        aw = aw_ref[0]
        vt = vt_ref[0].astype(jnp.float32)         # (W, H*D)
        E = e_ref[...].astype(jnp.float32)         # (H, H*D)
        F = f_ref[...].astype(jnp.float32)         # (H*D, D)
        hxs = jnp.concatenate(
            [jnp.maximum(0.0, 1.0 - jnp.abs(px[:, p:p + 1] - wx))
             for p in range(PL)], axis=0)          # (PL*TQ, W)
        U = jax.lax.dot_general(                   # (PL*TQ, H*D)
            hxs, vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Q = None
        for p in range(PL):  # static unroll
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, p:p + 1] - wy))
            wyx = jax.lax.dot_general(             # (TQ, H*D)
                aw[:, p:p + 1] * hy, E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            Qp = wyx * U[p * TQ:(p + 1) * TQ]
            Q = Qp if Q is None else Q + Qp
        out_ref[0] = jax.lax.dot_general(
            Q, F, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    return kernel


def ms_deform_attn_pallas_hat_sep(value, spatial_shapes,
                                  sampling_locations, attention_weights,
                                  interpret: bool = False,
                                  block_q: int = _TQ_OH):
    """Single-level MSDA via the two-stage separable hat kernel."""
    spatial_shapes = tuple(spatial_shapes)
    assert len(spatial_shapes) == 1, "sep hat kernel is single-level"
    H, W = spatial_shapes[0]
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    PL = L * P

    loc = sampling_locations.astype(jnp.float32)
    aw = attention_weights.astype(jnp.float32)
    px = loc[:, :, :, 0, :, 0] * W - 0.5           # (B, Lq, M, P)
    py = loc[:, :, :, 0, :, 1] * H - 0.5
    aw = aw.reshape(B, Lq, M, PL)

    px_bm = px.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    py_bm = py.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    aw_bm = aw.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    # x-major value slab: Vt[bm, x, y*D+d]
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, H, W, D)
    vt_bm = v_bm.transpose(0, 2, 1, 3).reshape(B * M, W, H * D)
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    wx = jnp.arange(W, dtype=jnp.float32)[None]
    wy = jnp.arange(H, dtype=jnp.float32)[None]
    eye = np.eye(H, dtype=np.float32)
    E = jnp.asarray(np.repeat(eye, D, axis=1))          # (H, H*D)
    F = jnp.asarray(np.tile(np.eye(D, dtype=np.float32), (H, 1)))
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hat_sep_kernel_factory(H, W, D, PL, block_q),
        grid=(B * M, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, W), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, W, H * D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H * D), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * D, D), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * M, Lq_pad, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # per query: U (PL*W*H*D) + wy expand (PL*H*H*D) + reduce
            flops=2 * B * M * Lq_pad * H * D * (PL * (W + H) + D),
            bytes_accessed=B * M * (S * D * value.dtype.itemsize
                                    + Lq_pad * PL * 12),
            transcendentals=0),
    )(wx, wy, px_bm, py_bm, aw_bm, vt_bm, E, F)
    out = out.reshape(B, M, Lq_pad, D)[:, :, :Lq]
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


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


_CS = 256  # token-chunk size of the sparse hat kernel


def _hat_sparse_kernel_factory(nC, CS):
    """Chunked hat kernel: the interpolation matrix W is >=95% zeros
    (deformable sampling is local — trained offsets stay within the
    object scale, and RoIAlign bins are local by construction), so the
    token axis is split into ``nC`` chunks of ``CS`` and both the W
    build and the matmul are skipped for chunks no sample point of the
    query block touches. The activity bits are computed conservatively
    outside (bounding-box test with the hat's support margin), so
    skipping never changes the result — only data-dependent speed."""

    def kernel(mask_ref, sx_ref, sy_ref, px_ref, py_ref, aw_ref,
               value_ref, out_ref, acc_ref):
        bm = pl.program_id(0)
        q = pl.program_id(1)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        px = px_ref[0]                             # (TQ, PL)
        py = py_ref[0]
        aw = aw_ref[0]
        PL = px.shape[1]
        for c in range(nC):  # static unroll
            @pl.when(mask_ref[bm, q, c] != 0)
            def _(c=c):
                sx = sx_ref[:, c * CS:(c + 1) * CS]      # (1, CS)
                sy = sy_ref[:, c * CS:(c + 1) * CS]
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, 0:1] - sx))
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, 0:1] - sy))
                W = (aw[:, 0:1] * hx) * hy
                for p in range(1, PL):
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(px[:, p:p + 1] - sx))
                    hy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(py[:, p:p + 1] - sy))
                    W = W + (aw[:, p:p + 1] * hx) * hy
                acc_ref[...] += jax.lax.dot_general(
                    W, value_ref[0, c * CS:(c + 1) * CS, :].astype(
                        jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def hat_sample_sparse(v_bm, sx_np, sy_np, px_bm, py_bm, aw_bm,
                      interpret: bool = False, block_q: int = _TQ_OH):
    """``hat_sample`` with chunk skipping. ``sx_np``/``sy_np`` must be
    host numpy arrays (static token geometry) so the per-chunk coordinate
    bounding boxes are compile-time constants.

    NB a NaN sample coordinate deactivates every chunk (comparisons are
    False), yielding 0 instead of NaN — matching the ``corner weight *
    0-gather`` behavior only for finite inputs; serving inputs are
    finite by construction."""
    import numpy as np
    BM, S, D = v_bm.shape
    _, Lq, PL = px_bm.shape
    CS = _CS
    S_pad = -(-S // CS) * CS
    nC = S_pad // CS
    if S_pad != S:
        v_bm = jnp.pad(v_bm, ((0, 0), (0, S_pad - S), (0, 0)))
        # padded tokens sit far outside any hat support
        sx_np = np.concatenate(
            [sx_np, np.full(S_pad - S, -1e6, np.float32)])
        sy_np = np.concatenate(
            [sy_np, np.full(S_pad - S, -1e6, np.float32)])
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    nQ = Lq_pad // block_q

    # conservative per-(program, chunk) activity: any sample point whose
    # hat support intersects the chunk's coordinate bounding box
    cb = np.arange(nC)[:, None] * CS + np.arange(CS)[None, :]
    bx = sx_np[cb]
    by = sy_np[cb]
    minx, maxx = jnp.asarray(bx.min(1)), jnp.asarray(bx.max(1))  # (nC,)
    miny, maxy = jnp.asarray(by.min(1)), jnp.asarray(by.max(1))
    pxq = px_bm.reshape(BM, nQ, block_q, PL, 1)
    pyq = py_bm.reshape(BM, nQ, block_q, PL, 1)
    active = ((pxq > minx - 1.0) & (pxq < maxx + 1.0)
              & (pyq > miny - 1.0) & (pyq < maxy + 1.0))
    mask = jnp.any(active, axis=(2, 3)).astype(jnp.int32)  # (BM, nQ, nC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BM, nQ),
        in_specs=[
            pl.BlockSpec((1, S_pad), lambda bm, q, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad), lambda bm, q, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q, m: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q, m: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, PL), lambda bm, q, m: (bm, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda bm, q, m: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D),
                               lambda bm, q, m: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )
    out = pl.pallas_call(
        _hat_sparse_kernel_factory(nC, CS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), v_bm.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BM * Lq_pad * S_pad * D
            + 11 * BM * Lq_pad * PL * S_pad,
            bytes_accessed=BM * (S_pad * D * v_bm.dtype.itemsize
                                 + Lq_pad * PL * 12),
            transcendentals=0),
    )(mask, jnp.asarray(sx_np)[None], jnp.asarray(sy_np)[None],
      px_bm, py_bm, aw_bm, v_bm)
    return out[:, :Lq]


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


def _hat_bwd_kernel(sx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
                    go_ref, gv_ref, gpx_ref, gpy_ref, gaw_ref):
    """Backward of ``_hat_kernel`` for one (batch*head, query-block)
    program — the TPU answer to the CUDA col2im backward
    (``ms_deform_im2col_cuda.cuh:301-921``), with every contraction on
    the MXU instead of atomic scatter-adds:

      G[q, s]   = <go[q, :], v[s, :]>                   (MXU)
      gaw[q, p] = sum_s hx hy G[q, s]                   (VPU reduce)
      gpx[q, p] = aw[q, p] * sum_s cx hy G[q, s]        (VPU reduce)
      gpy[q, p] = aw[q, p] * sum_s cy hx G[q, s]
      gv[s, d] += sum_q W[q, s] go[q, d]                (MXU, accumulated
                                                         across q blocks)

    Location gradients use the integer-point sample-difference identity:
    d/dpx of a piecewise-linear interpolant equals (sample at x=ceil px)
    - (sample at x=floor px), and a hat evaluated at an integer point is
    an equality indicator, so ``cx = [sx == floor(px)+1] - [sx ==
    floor(px)]`` — two eq-compares instead of the sign/select tent-
    derivative chain (measured 7.6 -> 7.0 ms at the B=8 encoder shape).

    Derivative convention at exactly-integer px: one-sided (right)
    derivative, matching the CUDA col2im formula
    (``ms_deform_im2col_cuda.cuh:316-330``: corner-difference weights)
    and the XLA corner formulation; the previous tent-subgradient kernel
    returned 0 there. The conventions differ only on the measure-zero
    integer grid.
    """
    q = pl.program_id(1)
    sx = sx_ref[...]                               # (1, S)
    sy = sy_ref[...]
    px = px_ref[0]                                 # (TQ, PL)
    py = py_ref[0]
    aw = aw_ref[0]
    v = value_ref[0]                               # (S, D)
    go = go_ref[0].astype(jnp.float32)             # (TQ, D)
    G = jax.lax.dot_general(                       # (TQ, S)
        go, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    PL = px.shape[1]
    pxf = jnp.floor(px)                            # (TQ, PL) — tiny
    pyf = jnp.floor(py)
    gaw_cols, gpx_cols, gpy_cols = [], [], []
    W = None
    for p in range(PL):  # static unroll: PL = L*P
        dx = px[:, p:p + 1] - sx                   # (TQ, S)
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
    gv = jax.lax.dot_general(                      # (S, D): W^T @ go
        W, go, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    gv_ref[0] += gv


def hat_sample_bwd(v_bm, sx, sy, px_bm, py_bm, aw_bm, go_bm,
                   interpret: bool = False, block_q: int = _TQ_OH):
    """Pallas backward of ``hat_sample``. Returns (gv, gpx, gpy, gaw),
    all f32, shapes matching the inputs."""
    BM, S, D = v_bm.shape
    _, Lq, PL = px_bm.shape
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
        go_bm = jnp.pad(go_bm, pad)
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    gv, gpx, gpy, gaw = pl.pallas_call(
        _hat_bwd_kernel,
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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BM * Lq_pad * S * D
            + 25 * BM * Lq_pad * PL * S,
            bytes_accessed=BM * (2 * S * D * 4 + Lq_pad * (PL * 24 + D * 4)),
            transcendentals=0),
    )(sx[None], sy[None], px_bm, py_bm, aw_bm, v_bm, go_bm)
    return gv, gpx[:, :Lq], gpy[:, :Lq], gaw[:, :Lq]


@functools.lru_cache(maxsize=None)
def hat_sample_vjp(interpret: bool = False, block_q: int = _TQ_OH):
    """Differentiable ``hat_sample``: Pallas forward + Pallas backward
    (``_hat_bwd_kernel``). Token coordinates (sx, sy) are geometry, not
    data — their cotangent is zero. Returned function signature matches
    ``hat_sample(v_bm, sx, sy, px_bm, py_bm, aw_bm)``."""

    @jax.custom_vjp
    def f(v, sx, sy, px, py, aw):
        return hat_sample(v, sx, sy, px, py, aw, interpret=interpret,
                          block_q=block_q)

    def fwd(v, sx, sy, px, py, aw):
        return f(v, sx, sy, px, py, aw), (v, sx, sy, px, py, aw)

    def bwd(res, go):
        v, sx, sy, px, py, aw = res
        gv, gpx, gpy, gaw = hat_sample_bwd(
            v, sx, sy, px, py, aw, go.astype(jnp.float32),
            interpret=interpret, block_q=block_q)
        return (gv.astype(v.dtype), jnp.zeros_like(sx),
                jnp.zeros_like(sy), gpx.astype(px.dtype),
                gpy.astype(py.dtype), gaw.astype(aw.dtype))

    f.defvjp(fwd, bwd)
    return f


def _msda_hat_bwd_kernel_factory(nQ: int):
    """``_hat_bwd_kernel`` specialized for the MSDA layout: takes the
    *normalized* sampling locations in their native dtype (bf16 in
    production), does the pixel-scale math (``loc * W - 0.5`` + per-level
    y offsets) in f32 inside the kernel, and emits every gradient in the
    caller's dtype with the dloc/dpx level scale folded in.

    Motivation (measured, B=8 encoder shape): the f32 staging tensors
    around the old kernel — px/py/aw/gpx/gpy/gaw are ``(BM, Lq, PL=4)``,
    whose 4-lane minor dim is (8,128)-tile-padded 32x in HBM — cost ~1 ms
    per instance in pad/convert fusions and tile-padded DMA. Keeping the
    boundary tensors in bf16 halves that traffic; the arithmetic is
    bit-identical because the f32 upcast/compute/downcast happens at the
    same points, just inside the kernel. ``grad_value`` accumulates
    across query blocks in an f32 VMEM scratch and is written out once in
    the value dtype at the last block.
    """

    def kernel(sx_ref, sy_ref, xs_ref, ys_ref, yo_ref, lx_ref, ly_ref,
               aw_ref, value_ref, go_ref,
               gv_ref, gpx_ref, gpy_ref, gaw_ref, acc_ref):
        q = pl.program_id(1)
        sx = sx_ref[...]                           # (1, S) f32
        sy = sy_ref[...]
        xs = xs_ref[...]                           # (1, PL) f32: W_l
        ys = ys_ref[...]                           # (1, PL) f32: H_l
        yo = yo_ref[...]                           # (1, PL) f32: y offset
        px = lx_ref[0].astype(jnp.float32) * xs - 0.5   # (TQ, PL)
        py = ly_ref[0].astype(jnp.float32) * ys - 0.5 + yo
        aw = aw_ref[0].astype(jnp.float32)
        v = value_ref[0]                           # (S, D)
        go = go_ref[0].astype(jnp.float32)         # (TQ, D)
        G = jax.lax.dot_general(                   # (TQ, S)
            go, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        PL = px.shape[1]
        pxf = jnp.floor(px)                        # (TQ, PL) — tiny
        pyf = jnp.floor(py)
        gaw_cols, gpx_cols, gpy_cols = [], [], []
        W = None
        for p in range(PL):  # static unroll: PL = L*P
            dx = px[:, p:p + 1] - sx               # (TQ, S)
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
        gaw_ref[0] = jnp.stack(gaw_cols, axis=1).astype(gaw_ref.dtype)
        # dpx/dloc_x = W_l: fold the scale-back here (was a separate
        # f32 elementwise op + downcast outside the kernel)
        gpx_ref[0] = (jnp.stack(gpx_cols, axis=1) * xs).astype(
            gpx_ref.dtype)
        gpy_ref[0] = (jnp.stack(gpy_cols, axis=1) * ys).astype(
            gpy_ref.dtype)
        gv = jax.lax.dot_general(                  # (S, D): W^T @ go
            W, go, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(q == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += gv

        @pl.when(q == nQ - 1)
        def _():
            gv_ref[0] = acc_ref[...].astype(gv_ref.dtype)

    return kernel


def _msda_hat_bwd_mxu_kernel_factory(nQ: int, Wx: int, Ty: int):
    """MXU-derivative variant of ``_msda_hat_bwd_kernel_factory``.

    The VPU-bound part of the hat backward is the per-point derivative
    chain on ``(TQ, S)`` tiles: compares + muls + lane reductions for
    gaw/gpx/gpy (~16 of the ~26 ops per point). But those reductions
    only need per-*column* / per-*row* aggregates of ``G*hy`` / ``G*hx``:

      gaw[q,p] = sum_c hx(c) * R[q,c],   R = (G*hy) @ X
      gpx[q,p] = aw * sum_c cx(c) * R[q,c]
      gpy[q,p] = aw * sum_r cy(r) * T[q,r],  T = (G*hx) @ Y

    where ``X (S, Wx)`` / ``Y (S, Ty)`` are *constant* 0/1 token-column /
    token-row indicator matrices (grid geometry), so the contraction over
    S rides the MXU (which sits mostly idle in this kernel) and the
    compare/reduce stage shrinks from ``(TQ, S)`` to ``(TQ, ~128)`` —
    ~15x fewer VPU elements. The hat/tent identities are evaluated on
    the column/row index instead of the token coordinate; level isolation
    still comes from hy's y-offsets (cross-level tokens have hy = 0 in R).
    """

    def kernel(sx_ref, sy_ref, xs_ref, ys_ref, yo_ref, lx_ref, ly_ref,
               aw_ref, value_ref, go_ref, xmat_ref, ymat_ref,
               gv_ref, gpx_ref, gpy_ref, gaw_ref, acc_ref):
        q = pl.program_id(1)
        sx = sx_ref[...]                           # (1, S) f32
        sy = sy_ref[...]
        xs = xs_ref[...]                           # (1, PL) f32: W_l
        ys = ys_ref[...]                           # (1, PL) f32: H_l
        yo = yo_ref[...]                           # (1, PL) f32: y offset
        px = lx_ref[0].astype(jnp.float32) * xs - 0.5   # (TQ, PL)
        py = ly_ref[0].astype(jnp.float32) * ys - 0.5 + yo
        aw = aw_ref[0].astype(jnp.float32)
        v = value_ref[0]                           # (S, D)
        go = go_ref[0].astype(jnp.float32)         # (TQ, D)
        xmat = xmat_ref[0]                         # (S, Wx) f32 0/1
        ymat = ymat_ref[0]                         # (S, Ty) f32 0/1
        G = jax.lax.dot_general(                   # (TQ, S)
            go, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        TQ, PL = px.shape
        pxf = jnp.floor(px)                        # (TQ, PL) — tiny
        pyf = jnp.floor(py)
        # Mosaic tpu.iota is integer-only; build int32 and convert
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, Wx), 1).astype(
            jnp.float32)
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, Ty), 1).astype(
            jnp.float32)
        gaw_cols, gpx_cols, gpy_cols = [], [], []
        W = None
        for p in range(PL):  # static unroll: PL = L*P
            dx = px[:, p:p + 1] - sx               # (TQ, S)
            dy = py[:, p:p + 1] - sy
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
            R = jax.lax.dot_general(               # (TQ, Wx) on MXU
                G * hy, xmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            T = jax.lax.dot_general(               # (TQ, Ty) on MXU
                G * hx, ymat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # small (TQ, ~128) stage: hat/eqdiff on the column/row index
            hxs = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, p:p + 1] - ix))
            gaw_cols.append(jnp.sum(hxs * R, axis=1))
            cx = ((ix == pxf[:, p:p + 1] + 1.0).astype(jnp.float32)
                  - (ix == pxf[:, p:p + 1]).astype(jnp.float32))
            cy = ((iy == pyf[:, p:p + 1] + 1.0).astype(jnp.float32)
                  - (iy == pyf[:, p:p + 1]).astype(jnp.float32))
            gpx_cols.append(aw[:, p] * jnp.sum(cx * R, axis=1))
            gpy_cols.append(aw[:, p] * jnp.sum(cy * T, axis=1))
            Wp = (aw[:, p:p + 1] * hx) * hy
            W = Wp if W is None else W + Wp
        gaw_ref[0] = jnp.stack(gaw_cols, axis=1).astype(gaw_ref.dtype)
        gpx_ref[0] = (jnp.stack(gpx_cols, axis=1) * xs).astype(
            gpx_ref.dtype)
        gpy_ref[0] = (jnp.stack(gpy_cols, axis=1) * ys).astype(
            gpy_ref.dtype)
        gv = jax.lax.dot_general(                  # (S, D): W^T @ go
            W, go, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(q == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += gv

        @pl.when(q == nQ - 1)
        def _():
            gv_ref[0] = acc_ref[...].astype(gv_ref.dtype)

    return kernel


def _hat_indicator_mats(sx_np, sy_np):
    """Constant 0/1 column/row indicator matrices for the MXU-derivative
    backward (f32 numpy): X[s, c] = [sx_s == c], Y[s, r] = [sy_s == r]."""
    Wx = int(sx_np.max()) + 1
    Ty = int(sy_np.max()) + 1
    xmat = (sx_np[:, None] == np.arange(Wx, dtype=np.float32)[None]
            ).astype(np.float32)
    ymat = (sy_np[:, None] == np.arange(Ty, dtype=np.float32)[None]
            ).astype(np.float32)
    return xmat, ymat


def ms_deform_attn_pallas_hat_bwd(value, spatial_shapes,
                                  sampling_locations, attention_weights,
                                  grad_out, interpret: bool = False,
                                  block_q: int = _TQ_OH,
                                  deriv: str = "auto"):
    """Full MSDA VJP via the hat backward kernel: maps the kernel's
    pixel-coordinate gradients back to the normalized (loc, attw)
    parametrization (dpx/dloc_x = W_l, dpy/dloc_y = H_l per level).
    All boundary tensors stay in the caller's dtype (see
    ``_msda_hat_bwd_kernel_factory``); the pixel-coordinate and
    scale-back math runs in f32 inside the kernel.

    ``deriv``: 'vpu' (lane-reduction derivative terms) or 'mxu'
    (indicator-matmul derivative terms, ``_msda_hat_bwd_mxu_kernel_factory``
    — measured 6.44 -> 5.37 ms per B=8 encoder instance, train step
    117.4 -> 106.5 ms; costs one extra bf16 MXU rounding stage on the
    location/attention gradients, same relative-error regime as the rest
    of the kernel); 'auto' reads ``DFVOD_HAT_BWD_DERIV`` (default 'mxu',
    falling back to 'vpu' when the constant indicator matrices would not
    fit the VMEM budget)."""
    spatial_shapes = tuple(spatial_shapes)
    if deriv == "auto":
        deriv = os.environ.get("DFVOD_HAT_BWD_DERIV", "mxu")
    if deriv == "mxu":
        S_tot = sum(h * w for h, w in spatial_shapes)
        Wx_est = max(w for h, w in spatial_shapes)
        Ty_est = sum(h + 2 for h, w in spatial_shapes) - 2
        if S_tot * (Wx_est + Ty_est) * 4 > 4 * 1024 * 1024:
            deriv = "vpu"
        # scoped-VMEM ceiling: the mxu variant's double-buffered blocks
        # (v, gv, xmat, ymat) + f32 scratch measure ~48 bytes per
        # token-lane (19 MB at S=3072, D=32 — Mosaic stack OOM at the
        # 16 MB scoped limit); drop the indicator matmuls first (the vpu
        # variant measures ~45 B/token-lane; ``hat_bwd_supported`` gates
        # the whole kernel out before either would OOM)
        if S_tot * max(value.shape[3], 128) * 48 > 15 * 1024 * 1024:
            deriv = "vpu"
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    PL = L * P

    lx = sampling_locations[..., 0].reshape(B, Lq, M, PL)
    ly = sampling_locations[..., 1].reshape(B, Lq, M, PL)
    aw_f = attention_weights.reshape(B, Lq, M, PL)
    lx_bm = lx.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    ly_bm = ly.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    aw_bm = aw_f.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    go_bm = grad_out.reshape(B, Lq, M, D).transpose(0, 2, 1, 3).reshape(
        B * M, Lq, D)
    sx_np, sy_np = _hat_coords(spatial_shapes)

    xs_np, ys_np, yo_np = _msda_level_geometry(spatial_shapes, P)

    BM = B * M
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        # pad samples far outside every hat's support so they contribute 0
        lx_bm = jnp.pad(lx_bm, pad, constant_values=-1e6)
        ly_bm = jnp.pad(ly_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
        go_bm = jnp.pad(go_bm, pad)
    nQ = Lq_pad // block_q
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    geom_spec = pl.BlockSpec((1, PL), lambda bm, q: (0, 0),
                             memory_space=pltpu.VMEM)
    tok_spec = pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        tok_spec, tok_spec, geom_spec, geom_spec, geom_spec,
        pt_spec, pt_spec, pt_spec,
        pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [jnp.asarray(sx_np)[None], jnp.asarray(sy_np)[None],
              jnp.asarray(xs_np)[None], jnp.asarray(ys_np)[None],
              jnp.asarray(yo_np)[None], lx_bm, ly_bm, aw_bm, v_bm, go_bm]
    if deriv == "mxu":
        xmat_np, ymat_np = _hat_indicator_mats(sx_np, sy_np)
        Wx, Ty = xmat_np.shape[1], ymat_np.shape[1]
        kernel = _msda_hat_bwd_mxu_kernel_factory(nQ, Wx, Ty)
        in_specs += [
            pl.BlockSpec((1, S, Wx), lambda bm, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Ty), lambda bm, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [jnp.asarray(xmat_np)[None], jnp.asarray(ymat_np)[None]]
    else:
        kernel = _msda_hat_bwd_kernel_factory(nQ)
    gv, gpx, gpy, gaw = pl.pallas_call(
        kernel,
        grid=(BM, nQ),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BM, S, D), value.dtype),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL),
                                 sampling_locations.dtype),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL),
                                 sampling_locations.dtype),
            jax.ShapeDtypeStruct((BM, Lq_pad, PL),
                                 attention_weights.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BM * Lq_pad * S * D
            + 25 * BM * Lq_pad * PL * S,
            bytes_accessed=BM * (2 * S * D * 4 + Lq_pad * (PL * 24 + D * 4)),
            transcendentals=0),
    )(*inputs)

    grad_value = gv.reshape(B, M, S, D).transpose(0, 2, 1, 3)
    gpx = gpx[:, :Lq].reshape(B, M, Lq, PL).transpose(0, 2, 1, 3)
    gpy = gpy[:, :Lq].reshape(B, M, Lq, PL).transpose(0, 2, 1, 3)
    gaw = gaw[:, :Lq].reshape(B, M, Lq, PL).transpose(0, 2, 1, 3)
    grad_loc = jnp.stack([gpx, gpy], -1).reshape(B, Lq, M, L, P, 2)
    grad_attw = gaw.reshape(B, Lq, M, L, P)
    return grad_value, grad_loc, grad_attw


def _msda_hat_fwd_kernel(sx_ref, sy_ref, xs_ref, ys_ref, yo_ref, lx_ref,
                         ly_ref, aw_ref, value_ref, out_ref):
    """``_hat_kernel`` specialized for the MSDA layout: normalized
    locations arrive in their native dtype and the pixel-scale math
    (``loc * W - 0.5`` + per-level y offsets) runs in f32 inside — no
    f32 staging tensors around the custom call (bit-identical for bf16
    callers; see ``_msda_hat_bwd_kernel_factory`` for the measurements).
    """
    sx = sx_ref[...]                               # (1, S)
    sy = sy_ref[...]
    xs = xs_ref[...]                               # (1, PL) f32: W_l
    ys = ys_ref[...]                               # (1, PL) f32: H_l
    yo = yo_ref[...]                               # (1, PL) f32: y offset
    px = lx_ref[0].astype(jnp.float32) * xs - 0.5  # (TQ, PL)
    py = ly_ref[0].astype(jnp.float32) * ys - 0.5 + yo
    aw = aw_ref[0].astype(jnp.float32)
    v = value_ref[0]
    PL = px.shape[1]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, 0:1] - sx))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, 0:1] - sy))
    W = (aw[:, 0:1] * hx) * hy
    for p in range(1, PL):  # static unroll: PL = L*P
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, p:p + 1] - sx))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, p:p + 1] - sy))
        W = W + (aw[:, p:p + 1] * hx) * hy
    if v.dtype == jnp.float32:
        # f32 path: the MXU on this toolchain runs bf16 passes whatever
        # preferred_element_type says, so recover ~f32 precision with a
        # split-precision accumulate — hi/lo bf16 halves of both W and v,
        # 3 bf16 matmuls with f32 accumulation (the dropped Wlo@vlo term
        # is O(2^-16) relative; VERDICT r1 #5, matching the reference's
        # dtype-templated CUDA kernel ``ms_deform_im2col_cuda.cuh:923``)
        W_hi = W.astype(jnp.bfloat16)
        W_lo = (W - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        v_hi = v.astype(jnp.bfloat16)
        v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(W_hi, v_hi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(W_hi, v_lo, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(W_lo, v_hi, dims,
                                   preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    else:
        out_ref[0] = jax.lax.dot_general(
            W, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _msda_level_geometry(spatial_shapes, P):
    """Per-sample-point (= per PL column) level geometry rows: x scale
    ``W_l``, y scale ``H_l``, and the level y offset (f32 numpy)."""
    xs_np = np.repeat(np.asarray([w for h, w in spatial_shapes],
                                 np.float32), P)
    ys_np = np.repeat(np.asarray([h for h, w in spatial_shapes],
                                 np.float32), P)
    yo_np = np.repeat(np.cumsum(
        [0.0] + [h + 2.0 for h, w in spatial_shapes[:-1]]).astype(
            np.float32), P)
    return xs_np, ys_np, yo_np


def ms_deform_attn_pallas_hat(value, spatial_shapes, sampling_locations,
                              attention_weights, interpret: bool = False,
                              block_q: int = _TQ_OH,
                              sparse: bool = False):
    """Gather-free MSDA via separable hat products (see ``_hat_kernel``).

    ``sparse=True`` selects the chunk-skipping variant
    (``hat_sample_sparse``). Measured on the 2026-08 toolchain it LOSES
    to the dense kernel even with most chunks inactive (per-chunk
    ``pl.when`` + accumulator overhead exceeds the skipped VPU work at
    CS=256), so dense stays the default; the sparse path is kept for
    toolchains/shapes where the W build dominates harder (e.g. much
    larger S with genuinely local trained offsets)."""
    spatial_shapes = tuple(spatial_shapes)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    PL = L * P
    sx_np, sy_np = _hat_coords(spatial_shapes)

    if sparse:
        loc = sampling_locations.astype(jnp.float32)
        aw = attention_weights.astype(jnp.float32)
        pxs, pys = [], []
        y_off = 0.0
        for l, (H, W) in enumerate(spatial_shapes):
            pxs.append(loc[:, :, :, l, :, 0] * W - 0.5)
            pys.append(loc[:, :, :, l, :, 1] * H - 0.5 + y_off)
            y_off += H + 2.0
        px = jnp.concatenate(pxs, -1)              # (B, Lq, M, PL)
        py = jnp.concatenate(pys, -1)
        aw = aw.reshape(B, Lq, M, PL)
        px_bm = px.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
        py_bm = py.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
        aw_bm = aw.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
        v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
        out = hat_sample_sparse(v_bm, sx_np, sy_np, px_bm, py_bm, aw_bm,
                                interpret=interpret, block_q=block_q)
        out = out.reshape(B, M, Lq, D)
        return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)

    lx = sampling_locations[..., 0].reshape(B, Lq, M, PL)
    ly = sampling_locations[..., 1].reshape(B, Lq, M, PL)
    aw_f = attention_weights.reshape(B, Lq, M, PL)
    lx_bm = lx.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    ly_bm = ly.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    aw_bm = aw_f.transpose(0, 2, 1, 3).reshape(B * M, Lq, PL)
    v_bm = value.transpose(0, 2, 1, 3).reshape(B * M, S, D)
    xs_np, ys_np, yo_np = _msda_level_geometry(spatial_shapes, P)

    BM = B * M
    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        # pad samples far outside every hat's support so they contribute 0
        lx_bm = jnp.pad(lx_bm, pad, constant_values=-1e6)
        ly_bm = jnp.pad(ly_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    geom_spec = pl.BlockSpec((1, PL), lambda bm, q: (0, 0),
                             memory_space=pltpu.VMEM)
    tok_spec = pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _msda_hat_fwd_kernel,
        grid=(BM, Lq_pad // block_q),
        in_specs=[
            tok_spec, tok_spec, geom_spec, geom_spec, geom_spec,
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BM * Lq_pad * S * D + 11 * BM * Lq_pad * PL * S,
            bytes_accessed=BM * (S * D * value.dtype.itemsize
                                 + Lq_pad * PL * 12),
            transcendentals=0),
    )(jnp.asarray(sx_np)[None], jnp.asarray(sy_np)[None],
      jnp.asarray(xs_np)[None], jnp.asarray(ys_np)[None],
      jnp.asarray(yo_np)[None], lx_bm, ly_bm, aw_bm, v_bm)
    out = out[:, :Lq].reshape(B, M, Lq, D)
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
                jnp.asarray(v, jnp.bfloat16), shapes, jnp.asarray(loc),
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


@functools.lru_cache(maxsize=1)
def _hat_f32_probe() -> bool:
    """Compile + numerics probe for the f32 split-precision hat path —
    must land within ~1e-4 relative of the exact-f32 XLA formulation."""
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
        import numpy as np
        from dfvod_tpu.ops.msda import ms_deform_attn_xla
        rng = np.random.default_rng(1)
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
        ok = bool(np.allclose(got, ref, atol=1e-4, rtol=1e-3))
        if not ok:
            print("[msda_pallas] f32 hat probe out of tolerance; XLA path")
        return ok
    except Exception as e:
        print(f"[msda_pallas] f32 hat probe failed ({type(e).__name__});"
              " XLA path")
        return False


def hat_supported(value, spatial_shapes) -> bool:
    """Production gate for the hat kernel — bf16 OR f32 values (f32 runs
    the split-precision 3-matmul path inside the kernel), W-tile +
    value-slab VMEM budget, plus the compile/numerics probe. The hat
    build is ~1.5x faster than the one-hot build (2.18 vs 3.36 ms at the
    B=8 encoder shape)."""
    if value.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    S, D = value.shape[1], value.shape[3]
    vmem = S * max(D, 128) * value.dtype.itemsize + _TQ_OH * S * 4
    if vmem > 8 * 1024 * 1024:
        return False
    return _hat_probe() and (value.dtype == jnp.bfloat16
                             or _hat_f32_probe())


@functools.lru_cache(maxsize=1)
def _hat_bwd_probe() -> bool:
    """Compile + numerics probe for the hat backward kernel (vs the flat
    path's XLA VJP)."""
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
        import numpy as np
        from dfvod_tpu.ops.msda import ms_deform_attn_flat
        rng = np.random.default_rng(0)
        shapes = ((8, 16),)
        v = np.asarray(rng.standard_normal((1, 128, 2, 8)), np.float32)
        loc = np.asarray(rng.uniform(0, 1, (1, 4, 2, 1, 2, 2)),
                         np.float32)
        attw = np.full((1, 4, 2, 1, 2), 0.25, np.float32)
        go = np.asarray(rng.standard_normal((1, 4, 16)), np.float32)

        def body():
            _, vjp = jax.vjp(
                lambda v_, l_, a_: ms_deform_attn_flat(
                    v_, shapes, l_, a_),
                jnp.asarray(v), jnp.asarray(loc), jnp.asarray(attw))
            ref = vjp(jnp.asarray(go))
            got = ms_deform_attn_pallas_hat_bwd(
                jnp.asarray(v), shapes, jnp.asarray(loc),
                jnp.asarray(attw), jnp.asarray(go))
            return ([np.asarray(x) for x in got],
                    [np.asarray(x) for x in ref])

        got, ref = _run_outside_trace(body)
        # bf16 MXU tolerance must be RELATIVE: grad_loc scales with the
        # level size (d px/d loc_x = W), so its entries are O(W) and a
        # 2^-8 bf16 mantissa shows up as ~0.4% relative error (measured
        # 0.072 on magnitude-18 entries) — an absolute gate would reject
        # a numerically-correct kernel.
        ok = all(np.allclose(g, r, rtol=2e-2, atol=3e-2)
                 for g, r in zip(got, ref))
        if not ok:
            print("[msda_pallas] hat bwd probe MISCOMPILED; XLA VJP")
        return ok
    except Exception as e:
        print(f"[msda_pallas] hat bwd probe failed ({type(e).__name__});"
              " XLA VJP")
        return False


def hat_bwd_supported(value) -> bool:
    """Gate for the Pallas hat backward: bf16 values (the kernel MXU is
    bf16 regardless of preferred type, so f32 callers keep the f32-exact
    XLA VJP), VMEM budget for the value slab + G tile + f32 gv slab, and
    the compile/numerics probe."""
    if value.dtype != jnp.bfloat16:
        return False
    S, D = value.shape[1], value.shape[3]
    # scoped-VMEM ceiling, empirically calibrated against Mosaic's 16 MB
    # stack: the vpu (lane-reduction) variant measures 17.79 MB at
    # S=3072, D=32 -> ~45 bytes per token-lane; the mxu variant 19.0 MB
    # -> ~48 (both OOM there). Gate on the cheaper variant with margin;
    # past it the exact XLA VJP takes over.
    if S * max(D, 128) * 46 > 15 * 1024 * 1024:
        return False
    return _hat_bwd_probe()


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
