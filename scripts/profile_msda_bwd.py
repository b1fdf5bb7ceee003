"""jax.profiler trace of the MSDA module fwd+bwd; prints per-op time.

Parses the xplane.pb directly (tensorboard_plugin_profile is incompatible
with the installed TF) and sums device-plane event durations by op name.
Usage: python scripts/profile_msda_bwd.py [mode]
  mode 'module' (default): full MSDeformAttn module grad
  mode 'kernel': raw ms_deform_attn op grad only
"""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D = 8, 1900, 256
FH, FW = 38, 50


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "module"
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    query = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 1, 2)), jnp.bfloat16)

    if mode == "module":
        from dfvod_tpu.models.layers import MSDeformAttn
        msda = MSDeformAttn(D, 1, 8, 4)
        mv = jax.jit(lambda r: msda.init(r, query, ref, query, ((FH, FW),),
                                         None))(key)
        mv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, mv)

        def loss(p, q):
            return jnp.sum(msda.apply(p, q, ref, q, ((FH, FW),),
                                      None).astype(jnp.float32))

        gf = jax.grad(loss, argnums=(0, 1))

        def step(c):
            g = gf(mv, query + c)
            s = sum(jnp.sum(t.astype(jnp.float32))
                    for t in jax.tree_util.tree_leaves(g))
            return (jnp.tanh(s) * 1e-6).astype(c.dtype)
    else:
        from dfvod_tpu.ops.msda import ms_deform_attn
        value = jnp.asarray(rng.standard_normal((B, S, 8, 32)),
                            jnp.bfloat16)
        loc = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 8, 1, 4, 2)),
                          jnp.bfloat16)
        attw = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((B, S, 8, 1, 4)),
                        jnp.bfloat16), axis=-1)
        gf = jax.grad(lambda v, l, a: jnp.sum(ms_deform_attn(
            v, ((FH, FW),), l, a, impl="pallas_hat").astype(jnp.float32)),
            argnums=(0, 1, 2))

        def step(c):
            g = gf(value + c, loc, attw)
            s = sum(jnp.sum(t.astype(jnp.float32))
                    for t in jax.tree_util.tree_leaves(g))
            return (jnp.tanh(s) * 1e-6).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(
        0, n, lambda i, c: step(c), c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))  # compile

    outdir = f"/tmp/prof_{mode}"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        float(loop(jnp.bfloat16(0.0), jnp.int32(10)))

    pbs = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", pbs)
    if not pbs:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as fh:
        xs.ParseFromString(fh.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata)
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e6  # -> us
                counts[name] += 1
        if not totals:
            continue
        print(f"\n== plane {plane.name} (line filter 'Ops') ==")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        tot = sum(totals.values())
        print(f"total device op time: {tot/1e3:.3f} ms over 10 iters")
        for name, us in rows[:35]:
            print(f"{us/10:9.1f} us/iter  x{counts[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
