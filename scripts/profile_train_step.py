"""jax.profiler trace of the FULL production train step (B=8 LateFusion
bf16 608x800); per-op and per-category time attribution.

Finds the next optimization lever empirically instead of by arithmetic:
the step is profiled exactly as benchmarked (fori_loop-chained TrainState
carry), then the xplane device events are summed by op name and bucketed
into coarse categories (Pallas MSDA fwd/bwd custom calls, convolution
fusions, other fusions, copies/DMA).

Usage: python scripts/profile_train_step.py [batch] [dtype]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    train_dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"

    from dfvod_tpu.models import build_model
    from dfvod_tpu.train import create_train_state, make_train_step
    from dfvod_tpu.utils.config import (
        Config, DataConfig, ModelConfig, TrainConfig)

    cfg = Config(
        model=ModelConfig(use_depth=True, fusion_type="LateFusion",
                          num_classes=3),
        train=TrainConfig(batch_size=B, train_dtype=train_dtype),
        data=DataConfig(use_depth=True))
    model, criterion, _ = build_model(cfg)
    H, W, T = 608, 800, 16
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.standard_normal((B, H, W, 4)).astype(np.float32),
        "mask": np.zeros((B, H, W), bool),
        "labels": np.full((B, T), 1, np.int32),
        "boxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32),
                         (B, T, 1)),
        "valid": np.tile(np.arange(T) < 2, (B, 1)),
    }
    state, tx, labels = create_train_state(jax.random.PRNGKey(0), model,
                                           cfg, batch, steps_per_epoch=100)
    step = make_train_step(model, criterion, tx, donate=False,
                           train_dtype=train_dtype, labels=labels)
    bd = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    def body(i, s):
        s2, _ = step(s, bd, key)
        return s2

    loop = jax.jit(lambda s0, n: jax.lax.fori_loop(0, n, body, s0))
    state = loop(state, jnp.int32(2))
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), state.params)

    iters = 5
    outdir = "/tmp/prof_train_step"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        s2 = loop(state, jnp.int32(iters))
        float(jnp.sum(jax.tree_util.tree_leaves(s2.params)[0]
                      .astype(jnp.float32)))

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
            return "msda fwd kernel"
        if "ms_deform_attn" in name:
            return "msda bwd kernel"
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
        print(f"== plane {plane.name} (B={B} {train_dtype}, "
              f"{iters} iters) ==")
        cats = defaultdict(float)
        top = None
        for name, us in totals.items():
            if top is None or us > totals.get(top, 0):
                pass
            cats[category(name)] += us
        # the while loop envelope double-counts; drop it from categories
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        envelope = rows[0][1] / iters if "while" in rows[0][0] else None
        if envelope:
            cats[category(rows[0][0])] -= rows[0][1]
        print("-- categories (us/iter) --")
        for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{us/iters:9.1f}  {c}")
        if envelope:
            print(f"{envelope:9.1f}  [while envelope = step wall]")
        print("-- top ops --")
        for name, us in rows[:35]:
            print(f"{us/iters:9.1f} us/iter  x{counts[name]:4d}  "
                  f"{name[:108]}")


if __name__ == "__main__":
    main()
