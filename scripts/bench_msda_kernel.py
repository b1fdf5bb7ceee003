"""MSDA kernel formulation microbenchmark on the real chip.

Uses the tunnel-safe methodology from PERF.md: N iterations chained in one
on-device fori_loop with a carry->input data dependency, one scalar
readback, RPC round-trip subtracted.

Usage: python scripts/bench_msda_kernel.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.ops import msda, msda_pallas

SHAPES = ((38, 50),)
M, D, P = 8, 32, 4
S = msda.total_tokens(SHAPES)
LQ = S  # encoder self-attention


def rpc_cost():
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(fn, value, loc, attw, iters=30):
    def body(i, c):
        l2 = jnp.clip(loc + c * 1e-6, 0.0, 1.0)
        out = fn(value, SHAPES, l2, attw)
        return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.float32(0.0), 2))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), iters))
    return (time.perf_counter() - t0 - rpc) / iters


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 8]
    rng = np.random.default_rng(0)
    for B in batches:
        value = jnp.asarray(rng.standard_normal((B, S, M, D)),
                            jnp.bfloat16)
        loc = jnp.asarray(rng.uniform(0, 1, (B, LQ, M, 1, P, 2)),
                          jnp.float32)
        attw = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((B, LQ, M, P)), jnp.float32), axis=-1)
        attw = attw.reshape(B, LQ, M, 1, P)

        # correctness spot check vs XLA oracle
        ref = np.asarray(msda.ms_deform_attn_xla(value, SHAPES, loc, attw),
                         np.float32)
        variants = {
            "flat": lambda v, s, l, a: msda.ms_deform_attn_flat(v, s, l, a),
            "onehot": msda_pallas.ms_deform_attn_pallas_onehot,
            "hat": msda_pallas.ms_deform_attn_pallas_hat,
            "hat_tiled": msda_pallas.ms_deform_attn_pallas_hat_tiled,
            "hat_sep": msda_pallas.ms_deform_attn_pallas_hat_sep,
        }
        only = os.environ.get("MSDA_VARIANTS", "")
        if only:
            variants = {k: v for k, v in variants.items()
                        if k in only.split(",")}
        for name, fn in variants.items():
            got = np.asarray(fn(value, SHAPES, loc, attw), np.float32)
            err = np.max(np.abs(got - ref))
            dt = measure(fn, value, loc, attw)
            print(f"B={B} {name:8s} {dt*1e3:7.3f} ms  max_err={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
