"""jax.profiler trace of the ResNet-50 fwd+bwd; per-op time attribution.

The R50 trunk backward runs ~3.0x its forward (26 vs 8.7 ms at B=8 bf16,
608x800) against a theoretical 2x — this finds which grad ops hold the
extra ~8 ms. Same xplane parsing as ``profile_msda_bwd.py``.
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    B, H, W = 8, 608, 800
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)

    from dfvod_tpu.models.backbone_resnet import ResNet50
    bb = ResNet50(dilation=True)
    vs = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    vs = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        vs)

    def loss(p, xx):
        return jnp.sum(bb.apply(p, xx, train=True)[4].astype(jnp.float32))

    gf = jax.grad(loss, argnums=(0, 1))

    def step(c):
        g = gf(vs, x + c)
        s = sum(jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(g))
        return (jnp.tanh(s) * 1e-6).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(
        0, n, lambda i, c: step(c), c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))

    outdir = "/tmp/prof_r50"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        float(loop(jnp.bfloat16(0.0), jnp.int32(8)))

    pbs = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        print("no trace written")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as fh:
        xs.ParseFromString(fh.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = dict(plane.event_metadata)
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e6
                counts[name] += 1
        if not totals:
            continue
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        print(f"== plane {plane.name} ==")
        for name, us in rows[:40]:
            print(f"{us/8:9.1f} us/iter  x{counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
