"""Micro-slice the decoder layer: MHA vs cross-MSDA vs FFN vs glue.

The serving breakdown showed a full decoder layer at ~1.35 ms (x6 = 8.1 ms)
while its cross-MSDA alone was previously measured ~0.37 ms — find the
missing ~1 ms. Measurements repeat 3x and take the min to dodge tunnel-RPC
noise on sub-ms kernels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, S, Q, D = 8, 1900, 300, 256
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


def measure(make_out, iters=100, reps=3):
    def body(i, c):
        out = make_out(c)
        return (jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6
                ).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))
    best = np.inf
    for _ in range(reps):
        rpc = rpc_cost()
        t0 = time.perf_counter()
        float(loop(jnp.bfloat16(0.0), jnp.int32(iters)))
        best = min(best, (time.perf_counter() - t0 - rpc) / iters)
    return best


def to16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def report(name, ms):
        print(f"{name:46s} {ms * 1e3:7.3f} ms", flush=True)

    from dfvod_tpu.models.layers import FFN, MSDeformAttn, MultiHeadAttention
    from dfvod_tpu.models.transformer import (
        DeformableTransformerDecoderLayer, DepthFusionLayer)

    qtok = rand(B, Q, D)
    qpos = rand(B, Q, D)
    mem = rand(B, S, D)
    ref_dec = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, 1, 2)), jnp.bfloat16)
    shapes = ((FH, FW),)

    mha = MultiHeadAttention(D, 8, 0.0)
    mhav = to16(jax.jit(lambda r: mha.init(r, qtok, qtok, qtok))(key))
    report("MHA self-attn (Q=300)", measure(
        lambda c: mha.apply(mhav, qtok + c, qtok + c, qtok + c)))

    cross = MSDeformAttn(D, 1, 8, 4)
    crossv = to16(jax.jit(lambda r: cross.init(
        r, qtok, ref_dec, mem, shapes, None))(key))
    report("cross-MSDA module (Q=300, S=1900)", measure(
        lambda c: cross.apply(crossv, qtok + c, ref_dec, mem + c, shapes,
                              None)))

    ffn = FFN(D, 1024, 0.0, "relu")
    ffnv = to16(jax.jit(lambda r: ffn.init(r, qtok))(key))
    report("FFN (Q=300)", measure(lambda c: ffn.apply(ffnv, qtok + c)))

    import flax.linen as nn
    ln = nn.LayerNorm(epsilon=1e-5)
    lnv = to16(jax.jit(lambda r: ln.init(r, qtok))(key))
    report("LayerNorm (Q=300)", measure(lambda c: ln.apply(lnv, qtok + c)))

    dec = DeformableTransformerDecoderLayer(D, 1024, 0.0, "relu", 1, 8, 4)
    decv = to16(jax.jit(lambda r: dec.init(
        r, qtok, qpos, ref_dec, mem, shapes, None))(key))
    report("full decoder layer", measure(
        lambda c: dec.apply(decv, qtok + c, qpos, ref_dec, mem + c,
                            shapes, None), iters=50))

    # LateFusion layer re-measured with more iterations (was noisy ~0)
    tokens = rand(B, S, D)
    pos = rand(B, S, D)
    ref_enc = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 1, 2)), jnp.bfloat16)
    lf = DepthFusionLayer(D, 0.0, 1, 8, 4)
    lfv = to16(jax.jit(lambda r: lf.init(
        r, tokens, pos, ref_enc, tokens, shapes, None))(key))
    report("LateFusion depth layer (S=1900)", measure(
        lambda c: lf.apply(lfv, tokens + c, pos, ref_enc, tokens + c,
                           shapes, None), iters=30))

    # encoder-shaped MSDA module alone for comparison
    enc_msda = MSDeformAttn(D, 1, 8, 4)
    encv = to16(jax.jit(lambda r: enc_msda.init(
        r, tokens, ref_enc, tokens, shapes, None))(key))
    report("encoder MSDA module (Q=S=1900)", measure(
        lambda c: enc_msda.apply(encv, tokens + c, ref_enc, tokens + c,
                                 shapes, None), iters=30))


if __name__ == "__main__":
    main()
