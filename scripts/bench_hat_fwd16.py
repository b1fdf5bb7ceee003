"""bf16-build experiment for the hat forward kernel.

Hypothesis: the W-build's (TQ,S) passes are VMEM-bandwidth-bound f32;
computing the tents and products in bf16 halves the traffic. Precision:
dx = px - sx stays f32 (coords up to ~1900 in merged-y space), the tent
values and products are in [0,1] where bf16's 0.4% relative error is the
same class as the MXU's existing bf16 truncation of W.
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
from dfvod_tpu.ops.msda_pallas import hat_sample

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
        out = fn(args[0] + c, *args[1:])
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


def _hat16_kernel(sx_ref, sy_ref, px_ref, py_ref, aw_ref, value_ref,
                  out_ref):
    sx = sx_ref[...]
    sy = sy_ref[...]
    px = px_ref[0]
    py = py_ref[0]
    aw = aw_ref[0]
    v = value_ref[0]
    npts = px.shape[1]
    W = None
    for p in range(npts):
        dx = (px[:, p:p + 1] - sx).astype(jnp.bfloat16)
        dy = (py[:, p:p + 1] - sy).astype(jnp.bfloat16)
        one = jnp.bfloat16(1.0)
        zero = jnp.bfloat16(0.0)
        hx = jnp.maximum(zero, one - jnp.abs(dx))
        hy = jnp.maximum(zero, one - jnp.abs(dy))
        Wp = (aw[:, p:p + 1].astype(jnp.bfloat16) * hx) * hy
        W = Wp if W is None else W + Wp
    out_ref[0] = jax.lax.dot_general(
        W, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def hat16_sample(v_bm, sx, sy, px_bm, py_bm, aw_bm, block_q=128):
    Lq_ = px_bm.shape[1]
    Lq_pad = -(-Lq_ // block_q) * block_q
    if Lq_pad != Lq_:
        pad = ((0, 0), (0, Lq_pad - Lq_), (0, 0))
        px_bm = jnp.pad(px_bm, pad, constant_values=-1e6)
        py_bm = jnp.pad(py_bm, pad, constant_values=-1e6)
        aw_bm = jnp.pad(aw_bm, pad)
    pt_spec = pl.BlockSpec((1, block_q, PL), lambda bm, q: (bm, q, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hat16_kernel,
        grid=(BM, Lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda bm, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, S, D), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bm, q: (bm, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), v_bm.dtype),
    )(sx[None], sy[None], px_bm, py_bm, aw_bm, v_bm)
    return out[:, :Lq_]


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((BM, S, D)), jnp.bfloat16)
    sx_np, sy_np = msda_pallas._hat_coords(((FH, FW),))
    sx, sy = jnp.asarray(sx_np), jnp.asarray(sy_np)
    px = jnp.asarray(rng.uniform(0, FW - 1, (BM, Lq, PL)), jnp.float32)
    py = jnp.asarray(rng.uniform(0, FH - 1, (BM, Lq, PL)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (BM, Lq, PL)), jnp.float32)

    ref = jax.jit(functools.partial(hat_sample, block_q=128))(
        v, sx, sy, px, py, aw)
    got = jax.jit(functools.partial(hat16_sample, block_q=128))(
        v, sx, sy, px, py, aw)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"fwd16 parity: max abs err {err:.3e} (scale {scale:.2f}, "
          f"rel {err/scale:.2e})")

    t = measure(jax.jit(functools.partial(hat_sample, block_q=128)),
                (v, sx, sy, px, py, aw))
    print(f"shipped fwd f32-build : {t*1e3:7.3f} ms", flush=True)
    for bq in (128, 256):
        try:
            t = measure(jax.jit(functools.partial(hat16_sample,
                                                  block_q=bq)),
                        (v, sx, sy, px, py, aw))
            print(f"bf16-build  block_q={bq:4d}: {t*1e3:7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"bf16-build  block_q={bq:4d}: FAILED ({str(e)[:80]})")


if __name__ == "__main__":
    main()
