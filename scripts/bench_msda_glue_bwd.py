"""Bisect the MSDA module's backward glue cost (B=8 encoder shape).

The module's fwd+bwd costs ~2.2 ms more than the raw kernel's fwd+bwd,
while its extra forward ops cost ~0.04 ms — some backward op in the glue
(projections / softmax / loc arithmetic / reshapes) is pathological.
Replace the kernel with a trivially-cheap consumer of the same inputs so
only the glue's backward remains, then strip parts one at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

B, S, D = 8, 1900, 256
M, L, P = 8, 1, 4
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


def measure(make_out, x0, iters=60, reps=3):
    def body(i, c):
        out = make_out(x0 + c)
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


class GlueOnly(nn.Module):
    """MSDeformAttn glue with the kernel replaced by a cheap consumer.

    mode flags strip parts: 'full', 'no_value', 'no_offsets', 'no_attw',
    'no_loc' (offsets consumed raw, no ref arithmetic), 'no_out'.
    """
    mode: str = "full"

    @nn.compact
    def __call__(self, query, reference_points):
        from dfvod_tpu.models.layers import (_sampling_offset_bias_init,
                                             dense)
        B_, Lq, _ = query.shape
        parts = []

        if self.mode != "no_value":
            value = dense(D, name="value_proj")(query)
            value = value.reshape(B_, Lq, M, D // M)
            parts.append(jnp.sum(value, axis=(2, 3)))       # (B, Lq)

        if self.mode != "no_offsets":
            offsets = nn.Dense(
                M * L * P * 2, name="sampling_offsets",
                kernel_init=nn.initializers.zeros,
                bias_init=_sampling_offset_bias_init(M, L, P))(query)
            offsets = offsets.reshape(B_, Lq, M, L, P, 2)
            if self.mode != "no_loc":
                wh = jnp.asarray([[FW, FH]], dtype=offsets.dtype)
                loc = (reference_points[:, :, None, :, None, :]
                       + offsets / wh[None, None, None, :, None, :])
                # the hat prep: scale to pixels, transpose to (BM, Lq, PL)
                px = loc[..., 0] * FW - 0.5
                py = loc[..., 1] * FH - 0.5
                px = px.reshape(B_, Lq, M, L * P).transpose(0, 2, 1, 3)
                py = py.reshape(B_, Lq, M, L * P).transpose(0, 2, 1, 3)
                parts.append(jnp.sum(px, axis=(1, 3)) * 1e-3)
                parts.append(jnp.sum(py, axis=(1, 3)) * 1e-3)
            else:
                parts.append(jnp.sum(offsets, axis=(2, 3, 4, 5)))

        if self.mode != "no_attw":
            attw = nn.Dense(M * L * P, name="attention_weights",
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros)(query)
            attw = jax.nn.softmax(attw.reshape(B_, Lq, M, L * P), axis=-1)
            parts.append(jnp.sum(attw, axis=(2, 3)))

        combined = sum(parts)[..., None] * jnp.ones((1, 1, D),
                                                    combined_dtype(query))
        if self.mode != "no_out":
            combined = dense(D, name="output_proj")(combined)
        return combined


def combined_dtype(x):
    return x.dtype


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    query = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, L, 2)), jnp.bfloat16)

    for mode in ("full", "no_value", "no_offsets", "no_attw", "no_loc",
                 "no_out"):
        m = GlueOnly(mode)
        mv = to16(jax.jit(lambda r, mm=m: mm.init(r, query, ref))(key))

        fwd = measure(lambda xx, mm=m, vv=mv: mm.apply(vv, xx, ref), query)

        def fb(xx, mm=m, vv=mv):
            def loss(p, q):
                return jnp.sum(mm.apply(p, q, ref).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(vv, xx)

        both = measure(fb, query)
        print(f"{mode:12s} fwd {fwd*1e3:7.3f}  fwd+bwd {both*1e3:7.3f}  "
              f"bwd {(both-fwd)*1e3:7.3f}", flush=True)


if __name__ == "__main__":
    main()
