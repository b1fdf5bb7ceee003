"""Fused ResNet bottleneck stage as a single Pallas TPU kernel.

XLA runs the stride-1 bottleneck stage (layer1: 3 blocks at 152x200 on
64/256 channels for a 608x800 input) well off the FLOPs roofline — the
large-spatial/small-channel conv shapes tile poorly and every block
round-trips its (B, H, W, 256) activations through HBM (~650 MB for
layer1 at B=8). This kernel runs the whole stage out of VMEM: the only
HBM traffic is the stage input (read) and output (write), with each
1x1 / 3x3 conv expressed as MXU matmuls over row-strips.

Parity target: ``models/backbone_scratch.py:102-141`` layer1 semantics
(torchvision Bottleneck: conv1x1-BN-ReLU, conv3x3-BN-ReLU, conv1x1-BN,
residual (+1x1-BN downsample on block 0), ReLU), with FrozenBatchNorm
folded into the conv weights/biases at trace time (exact: BN with fixed
stats is an affine map).

Design notes:
- grid (B, H/TR); each program computes TR output rows of the whole
  stage. The 3x3 convs consume one halo row per block, so the program
  DMAs TR + 2*nblocks rows from a zero-row-padded copy of x (input kept
  in HBM via ``memory_space=ANY``, windowed with ``pl.ds`` — halo
  windows overlap, which BlockSpec block indexing cannot express) and
  masks computed-on-padding rows back to zero between blocks (conv
  zero-padding semantics: the pad region of each conv's *input* is
  zero, not relu(bias)).
- all matmuls accumulate in f32 on the MXU; activations round to bf16
  between convs, mirroring XLA's bf16 conv lowering in serving mode.
- the 3x3 conv is 9 shifted (rows*W, Cm) @ (Cm, Cm) tap-matmuls
  accumulated in f32 — no im2col materialization.
- backward: ``jax.custom_vjp`` whose cotangent is XLA autodiff of the
  reference (unfused) formulation — the training path's existing conv
  gradients, so enabling the kernel never changes gradient lowering.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate row-tile sizes; pick the largest that divides H. Mosaic
# allocates the whole strip's temporaries on the scoped-VMEM stack
# (~16 MB): at W=200/Cout=256 a 19-row tile OOMs (19.2 MB), 8 rows fits.
_TR_CANDIDATES = (10, 8, 6, 4)


def pick_tile_rows(H: int) -> Optional[int]:
    for tr in _TR_CANDIDATES:
        if H % tr == 0:
            return tr
    return None


def _row_mask(rows: int, start_global, H: int, dtype):
    """(rows, 1, 1) mask: 1 where the global row index is in [0, H)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + start_global
    return ((r >= 0) & (r < H)).astype(dtype)


def _block_body(xin, rows_in, W, wset, mask_start, H, out_dtype):
    """One bottleneck block on a (rows_in, W, Cin) strip.

    wset = (w1, b1, w2, b2, w3, b3, wd_or_None, bd_or_None); w* bf16
    2-D/(3,3,...) matmul layouts, b* f32.
    Returns (rows_in - 2, W, Cout); ``mask_start`` is the global row
    index of xin's first row (negative in the top halo).
    """
    w1, b1, w2, b2, w3, b3, wd, bd = wset
    Cin = xin.shape[-1]
    Cm = w1.shape[-1]
    Cout = w3.shape[-1]
    rows_out = rows_in - 2

    t = jax.lax.dot_general(
        xin.reshape(rows_in * W, Cin), w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t = jnp.maximum(t + b1[None, :], 0.0).astype(out_dtype)
    t = t.reshape(rows_in, W, Cm)
    # rows that are conv zero-padding of this block's input must enter
    # the 3x3 as zeros, not relu(b1)
    t = t * _row_mask(rows_in, mask_start, H, out_dtype)
    zcol = jnp.zeros((rows_in, 1, Cm), out_dtype)
    tp = jnp.concatenate([zcol, t, zcol], axis=1)

    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = tp[dy:dy + rows_out, dx:dx + W, :]
            m = jax.lax.dot_general(
                tap.reshape(rows_out * W, Cm), w2[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = m if acc is None else acc + m
    u = jnp.maximum(acc + b2[None, :], 0.0).astype(out_dtype)

    y = jax.lax.dot_general(
        u, w3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b3[None, :]
    xc = xin[1:1 + rows_out].reshape(rows_out * W, Cin)
    if wd is not None:
        idn = jax.lax.dot_general(
            xc, wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bd[None, :]
    else:
        idn = xc.astype(jnp.float32)
    y = jnp.maximum(y + idn, 0.0).astype(out_dtype)
    return y.reshape(rows_out, W, Cout)


def _stage_pallas(x, weights, TR: int, interpret: bool = False):
    B, H, W, Cin = x.shape
    nblocks = len(weights)
    halo = nblocks
    Cout = weights[0][4].shape[-1]
    assert H % TR == 0, (H, TR)
    # Mosaic DMA slices must be lane-aligned: pad the input channel dim
    # to 128 with zeros and zero-pad block 0's w1/wd input rows to match
    # (exact — the extra channels are zero)
    Cpad = -(-Cin // 128) * 128
    if Cpad != Cin:
        w1, b1, w2, b2, w3, b3, wd, bd = weights[0]
        pad_w = ((0, Cpad - Cin), (0, 0))
        weights = (( (jnp.pad(w1, pad_w), b1, w2, b2, w3, b3,
                      None if wd is None else jnp.pad(wd, pad_w), bd),)
                   + tuple(weights[1:]))
        xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, Cpad - Cin)))
        Cin = Cpad
    else:
        xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))

    present = []
    arrays = []
    for blk in weights:
        for a in blk:
            present.append(a is not None)
            if a is not None:
                arrays.append(a)

    rows_in = TR + 2 * halo

    def kernel(*refs):
        x_hbm = refs[0]
        arr_refs = refs[1:1 + len(arrays)]
        out_ref = refs[1 + len(arrays)]
        xbuf = refs[2 + len(arrays)]
        sem = refs[3 + len(arrays)]
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TR, rows_in)], xbuf, sem)
        cp.start()
        cp.wait()
        it = iter(arr_refs)
        wrefs = [next(it)[...] if p else None for p in present]
        y = xbuf[...]
        rows = rows_in
        start = i * TR - halo
        for blk in range(nblocks):
            y = _block_body(y, rows, W, wrefs[8 * blk:8 * blk + 8],
                            start, H, out_ref.dtype)
            rows -= 2
            start += 1
        out_ref[0] = y

    flops = 0
    for blk in weights:
        w1, _, w2, _, w3, _, wd, _ = blk
        per_pos = (w1.shape[0] * w1.shape[-1] + 9 * w2.shape[-2] *
                   w2.shape[-1] + w3.shape[0] * w3.shape[-1]
                   + (wd.shape[0] * wd.shape[-1] if wd is not None else 0))
        flops += 2 * B * H * W * per_pos

    out = pl.pallas_call(
        kernel,
        grid=(B, H // TR),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=pl.BlockSpec((1, TR, W, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_in, W, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * H * W * Cout * x.dtype.itemsize,
            transcendentals=0),
    )(xp, *arrays)
    return out


def grad_stage(x, weights):
    """Unfused native-dtype formulation used for the custom_vjp
    cotangent: convs in the activation dtype (bf16 in serving/training),
    exactly the structure XLA autodiffs on the unfused module path
    today. (``reference_stage`` keeps f32 accumulation via
    ``preferred_element_type`` as the forward parity oracle, but JAX's
    conv transpose rejects mixed-dtype cotangents there.)"""
    y = x
    for (w1, b1, w2, b2, w3, b3, wd, bd) in weights:
        t = jnp.einsum("bhwc,cd->bhwd", y, w1.astype(y.dtype))
        t = jax.nn.relu(t + b1.astype(y.dtype))
        u = jax.lax.conv_general_dilated(
            t, w2.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        u = jax.nn.relu(u + b2.astype(y.dtype))
        o = jnp.einsum("bhwc,cd->bhwd", u, w3.astype(y.dtype))
        o = o + b3.astype(y.dtype)
        if wd is not None:
            idn = jnp.einsum("bhwc,cd->bhwd", y, wd.astype(y.dtype))
            idn = idn + bd.astype(y.dtype)
        else:
            idn = y
        y = jax.nn.relu(o + idn)
    return y


def reference_stage(x, weights):
    """Unfused XLA formulation of the same folded-weight stage with f32
    accumulation — the forward parity oracle for the Pallas kernel."""
    y = x
    for (w1, b1, w2, b2, w3, b3, wd, bd) in weights:
        Cin = y.shape[-1]
        Cm = w1.shape[-1]
        t = jnp.einsum("bhwc,cd->bhwd", y, w1.astype(y.dtype),
                       preferred_element_type=jnp.float32)
        t = jnp.maximum(t + b1, 0.0).astype(y.dtype)
        u = jax.lax.conv_general_dilated(
            t, w2.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        u = jnp.maximum(u + b2, 0.0).astype(y.dtype)
        o = jnp.einsum("bhwc,cd->bhwd", u, w3.astype(y.dtype),
                       preferred_element_type=jnp.float32) + b3
        if wd is not None:
            idn = jnp.einsum("bhwc,cd->bhwd", y, wd.astype(y.dtype),
                             preferred_element_type=jnp.float32) + bd
        else:
            idn = y.astype(jnp.float32)
        y = jnp.maximum(o + idn, 0.0).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=1)
def _probe() -> bool:
    """Compile + numerics probe on a tiny stage (same guard style as the
    MSDA kernels: never trust an unprobed Mosaic lowering). Runs in a
    fresh thread so it executes eagerly even when first hit inside a
    jit trace (JAX trace state is thread-local — without this the
    np.asarray below sees tracers, throws, and caches False forever)."""
    try:
        import jax.extend.backend
        if jax.extend.backend.get_backend().platform not in ("tpu",
                                                             "axon"):
            return False
        from dfvod_tpu.ops.msda_pallas import _run_outside_trace
        return _run_outside_trace(_probe_body)
    except Exception:
        return False


def _probe_body() -> bool:
    try:
        rng = np.random.default_rng(0)
        H, W, Cin, Cm = 16, 16, 8, 8
        x = jnp.asarray(rng.standard_normal((1, H, W, Cin)),
                        jnp.bfloat16)
        blks = []
        for b in range(2):
            cin = Cin if b == 0 else 4 * Cm
            blks.append(tuple(
                jnp.asarray(a, jnp.bfloat16) if i % 2 == 0 and a is not None
                else (jnp.asarray(a, jnp.float32) if a is not None
                      else None)
                for i, a in enumerate((
                    rng.standard_normal((cin, Cm)) * .1,
                    rng.standard_normal((Cm,)),
                    rng.standard_normal((3, 3, Cm, Cm)) * .1,
                    rng.standard_normal((Cm,)),
                    rng.standard_normal((Cm, 4 * Cm)) * .1,
                    rng.standard_normal((4 * Cm,)),
                    rng.standard_normal((cin, 4 * Cm)) * .1
                    if b == 0 else None,
                    rng.standard_normal((4 * Cm,)) if b == 0 else None,
                ))))
        got = np.asarray(jax.jit(
            lambda xx: _stage_pallas(xx, tuple(blks), TR=8))(x),
            np.float32)
        ref = np.asarray(jax.jit(
            lambda xx: reference_stage(xx, tuple(blks)))(x), np.float32)
        scale = max(1e-6, float(np.abs(ref).max()))
        return bool(np.isfinite(got).all()
                    and np.abs(got - ref).max() / scale < 5e-2)
    except Exception:
        return False


def supported(x, nblocks: int) -> bool:
    """Gate: bf16 serving on TPU, tileable height, VMEM budget, probe."""
    if x.dtype != jnp.bfloat16 or x.ndim != 4:
        return False
    B, H, W, Cin = x.shape
    TR = pick_tile_rows(H)
    if TR is None:
        return False
    # rough VMEM bound: input strip + two 4*Cm strips + f32 accumulator
    rows = TR + 2 * nblocks
    vmem = rows * W * max(Cin, 128) * 2 * 3 + TR * W * 4 * 128 * 4
    if vmem > 12 * 1024 * 1024:
        return False
    import jax.extend.backend
    if jax.extend.backend.get_backend().platform not in ("tpu", "axon"):
        return False
    return _probe()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stage_vjp(x, weights, TR):
    return _stage_pallas(x, weights, TR)


def _stage_vjp_fwd(x, weights, TR):
    return _stage_pallas(x, weights, TR), (x, weights)


def _stage_vjp_bwd(TR, res, g):
    x, weights = res
    _, vjp = jax.vjp(lambda xx, ww: grad_stage(xx, ww), x, weights)
    return vjp(g.astype(x.dtype))


_stage_vjp.defvjp(_stage_vjp_fwd, _stage_vjp_bwd)


def fused_bottleneck_stage(x, weights: Sequence[Tuple]):
    """Run a stride-1 bottleneck stage through the fused Pallas kernel.

    x: (B, H, W, Cin) bf16. weights: per-block tuples
    (w1 (Cin,Cm) bf16, b1 (Cm,) f32, w2 (3,3,Cm,Cm) bf16, b2 f32,
    w3 (Cm,Cout) bf16, b3 f32, wd (Cin,Cout) bf16 | None, bd | None)
    with FrozenBN already folded in. Differentiable (XLA cotangent).

    Caller must have checked ``supported()``.
    """
    TR = pick_tile_rows(x.shape[1])
    return _stage_vjp(x, tuple(weights), TR)
