"""Dump optimized HLO for the MSDA module fwd+bwd and summarize big ops."""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D = 8, 1900, 256
FH, FW = 38, 50


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    query = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 1, 2)), jnp.bfloat16)

    from dfvod_tpu.models.layers import MSDeformAttn
    msda = MSDeformAttn(D, 1, 8, 4)
    mv = jax.jit(lambda r: msda.init(r, query, ref, query, ((FH, FW),),
                                     None))(key)
    mv = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        mv)

    def loss(p, q):
        return jnp.sum(msda.apply(p, q, ref, q, ((FH, FW),),
                                  None).astype(jnp.float32))

    f = jax.jit(jax.grad(loss, argnums=(0, 1)))
    txt = f.lower(mv, query).compile().as_text()
    out = "/tmp/msda_bwd.hlo"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    # rough per-op footprint: bytes of the output shape of each fusion /
    # custom-call / standalone op at the entry computation level
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f16": 2}
    rows = []
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\][^ ]* "
            r"(fusion|custom-call|transpose|convert|copy|dot|convolution|"
            r"scatter|gather|dynamic-slice|dynamic-update-slice|reduce)",
            txt, re.M):
        name, dt, dims, kind = m.groups()
        if dt not in dt_bytes:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        rows.append((n * dt_bytes[dt], kind, dt, dims, name))
    rows.sort(reverse=True)
    print("\ntop output-footprint ops:")
    for b, kind, dt, dims, name in rows[:25]:
        print(f"{b/1e6:9.1f} MB  {kind:18s} {dt}[{dims}]  {name[:60]}")


if __name__ == "__main__":
    main()
