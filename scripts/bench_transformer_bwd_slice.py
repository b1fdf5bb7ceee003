"""Per-layer forward vs backward profile of the transformer stack (B=8).

PERF.md pins the train step's headroom in "transformer backward ~2.9x its
forward"; this attributes it: encoder layer, decoder layer, LateFusion
layer, FFN, MHA, and the raw MSDA hat fwd/bwd kernels, each measured
fwd-only and fwd+bwd with the tunnel-safe chained loop (min of 3 reps).

Gradients flow to BOTH params and inputs (as in the real train step).
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


def measure(make_out, x0, iters=30, reps=3):
    """make_out(x) -> pytree; x perturbed via carry each iteration."""
    def body(i, c):
        out = make_out(jax.tree_util.tree_map(lambda t: t + c, x0))
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


def to16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def profile(name, apply_fn, params, x0, iters=30):
    """apply_fn(params, xtree) -> pytree."""
    fwd = measure(lambda xx: apply_fn(params, xx), x0, iters)

    def fb(xx):
        def loss(p, xt):
            out = apply_fn(p, xt)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(out))
        return jax.grad(loss, argnums=(0, 1))(params, xx)

    both = measure(fb, x0, iters)
    print(f"{name:38s} fwd {fwd*1e3:7.3f}  fwd+bwd {both*1e3:7.3f}  "
          f"bwd {(both-fwd)*1e3:7.3f}  ratio {(both-fwd)/max(fwd,1e-9):4.1f}x",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    from dfvod_tpu.models.layers import FFN, MSDeformAttn, MultiHeadAttention
    from dfvod_tpu.models.transformer import (
        DeformableTransformerDecoderLayer,
        DeformableTransformerEncoderLayer,
        DepthFusionLayer,
    )

    tokens = rand(B, S, D)
    pos = rand(B, S, D)
    ref_enc = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 1, 2)), jnp.bfloat16)
    qtok = rand(B, Q, D)
    qpos = rand(B, Q, D)
    ref_dec = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, 1, 2)), jnp.bfloat16)
    shapes = ((FH, FW),)

    enc = DeformableTransformerEncoderLayer(D, 1024, 0.0, "relu", 1, 8, 4)
    encv = to16(jax.jit(lambda r: enc.init(
        r, tokens, pos, ref_enc, shapes, None, True))(key))
    profile("encoder layer", lambda p, xx: enc.apply(
        p, xx, pos, ref_enc, shapes, None, True), encv, tokens)

    msda = MSDeformAttn(D, 1, 8, 4)
    msdav = to16(jax.jit(lambda r: msda.init(
        r, tokens, ref_enc, tokens, shapes, None))(key))
    profile("encoder MSDA module", lambda p, xx: msda.apply(
        p, xx, ref_enc, xx, shapes, None), msdav, tokens)

    lf = DepthFusionLayer(D, 0.0, 1, 8, 4)
    lfv = to16(jax.jit(lambda r: lf.init(
        r, tokens, pos, ref_enc, tokens, shapes, None))(key))
    profile("LateFusion layer", lambda p, xx: lf.apply(
        p, xx, pos, ref_enc, xx, shapes, None), lfv, tokens)

    dec = DeformableTransformerDecoderLayer(D, 1024, 0.0, "relu", 1, 8, 4)
    decv = to16(jax.jit(lambda r: dec.init(
        r, qtok, qpos, ref_dec, tokens, shapes, None))(key))
    profile("decoder layer", lambda p, xx: dec.apply(
        p, xx[0], qpos, ref_dec, xx[1], shapes, None), decv,
        (qtok, tokens))

    ffn = FFN(D, 1024, 0.0, "relu")
    ffnv = to16(jax.jit(lambda r: ffn.init(r, tokens))(key))
    profile("FFN (S=1900)", lambda p, xx: ffn.apply(p, xx), ffnv, tokens,
            iters=60)

    mha = MultiHeadAttention(D, 8, 0.0)
    mhav = to16(jax.jit(lambda r: mha.init(r, qtok, qtok, qtok))(key))
    profile("MHA (Q=300)", lambda p, xx: mha.apply(p, xx, xx, xx), mhav,
            qtok, iters=60)

    # raw kernel: hat fwd vs custom-VJP bwd at the encoder shape
    from dfvod_tpu.ops.msda import ms_deform_attn
    value = rand(B, S, 8, 32)
    loc = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 8, 1, 4, 2)),
                      jnp.bfloat16)
    attw = jax.nn.softmax(rand(B, S, 8, 1, 4), axis=-1)

    fwd = measure(lambda xx: ms_deform_attn(
        xx[0], shapes, xx[1], xx[2], impl="pallas_hat"),
        (value, loc, attw))
    print(f"{'raw hat kernel fwd':38s} {fwd*1e3:7.3f} ms", flush=True)

    def fb(xx):
        return jax.grad(lambda v, l, a: jnp.sum(ms_deform_attn(
            v, shapes, l, a, impl="pallas_hat").astype(jnp.float32)),
            argnums=(0, 1, 2))(*xx)

    both = measure(fb, (value, loc, attw))
    print(f"{'raw hat kernel fwd+bwd':38s} {both*1e3:7.3f} ms "
          f"(bwd {((both-fwd))*1e3:7.3f})", flush=True)


if __name__ == "__main__":
    main()
