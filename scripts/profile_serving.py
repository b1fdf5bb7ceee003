"""jax.profiler trace of the production serving forward (B=8 LateFusion
bf16 608x800, uint8 on-device preprocess) — per-op time attribution.

PERF.md's serving table explains ~75% of the 36 ms forward (backbone,
DFormer, encoder/decoder MSDA); this attributes the remaining ~9 ms
"rest" bucket op-by-op so the next serving lever is picked empirically.

Usage: python scripts/profile_serving.py [batch]
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 608, 800


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from dfvod_tpu.data.device_pipeline import device_normalize
    from dfvod_tpu.models import build_model
    from dfvod_tpu.utils.config import Config, ModelConfig

    cfg = ModelConfig(use_depth=True, fusion_type="LateFusion",
                      num_classes=3)
    model, _, _ = build_model(Config(model=cfg))
    rng = np.random.default_rng(0)
    imgs_u8 = jnp.asarray(rng.integers(0, 254, (B, H, W, 4)), jnp.uint8)
    sizes = jnp.tile(jnp.array([[H, W]]), (B, 1))
    img0, mask0 = device_normalize(imgs_u8, sizes)
    variables = jax.jit(lambda r: model.init(
        r, img0, mask0, train=False))(jax.random.PRNGKey(0))
    variables = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)

    def body(i, c):
        x = imgs_u8 + (c > 0).astype(jnp.uint8)
        img, mask = device_normalize(x, sizes)
        out = model.apply(variables, img.astype(jnp.bfloat16), mask,
                          train=False)["pred_logits"]
        return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.float32(0.0), 2))  # compile + warm

    iters = 10
    outdir = "/tmp/prof_serving"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        float(loop(jnp.float32(0.0), iters))

    pbs = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        print("no trace written")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as fh:
        xs.ParseFromString(fh.read())

    def category(name):
        if "ms_deform_attn" in name and "custom-call" in name:
            return "msda kernel"
        if "convolution" in name or "conv" in name.split("=")[0]:
            return "convolution"
        if "copy" in name or "slice-start" in name or "dynamic-update" in name:
            return "copies/DMA"
        if "fusion" in name:
            return "fusions"
        if "dot" in name:
            return "matmuls"
        return "other"

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
        print(f"== plane {plane.name} (serving B={B} bf16, "
              f"{iters} iters) ==")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        envelope = rows[0][1] / iters if "while" in rows[0][0] else None
        cats = defaultdict(float)
        for name, us in totals.items():
            cats[category(name)] += us
        if envelope:
            cats[category(rows[0][0])] -= rows[0][1]
        print("-- categories (us/iter) --")
        for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{us/iters:9.1f}  {c}")
        if envelope:
            print(f"{envelope:9.1f}  [while envelope = forward wall]")
        print("-- top ops --")
        for name, us in rows[:45]:
            print(f"{us/iters:9.1f} us/iter  x{counts[name]:4d}  "
                  f"{name[:108]}")


if __name__ == "__main__":
    main()
