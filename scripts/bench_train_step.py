"""Full train-step wall time on the real chip: f32 vs bf16 mixed
precision (``--train_dtype bfloat16``).

Tunnel-safe methodology (PERF.md): N steps chained in ONE on-device
fori_loop with the TrainState as carry (each step consumes the previous
step's params — nothing can be hoisted or elided), one scalar readback,
RPC round-trip subtracted.

Usage: python scripts/bench_train_step.py [batch] [iters] [dtype] [remat]
(remat: pass "remat" to jax.checkpoint the encoder layers — the memory
dial that may move the B=16 spill regression, PERF.md batch scaling).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.models import build_model
from dfvod_tpu.train import create_train_state, make_train_step
from dfvod_tpu.utils.config import (
    Config, DataConfig, ModelConfig, TrainConfig)


def rpc_cost():
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(train_dtype: str, B: int, iters: int,
            remat: bool = False, fusion: str = "LateFusion") -> float:
    # fusion="Baseline": the reference's Baseline recipe TRAINS the
    # backbone at 0.1x lr (``main.py:404-421``) — no frozen trunk, so the
    # R50 backward is on the critical path (VERDICT r2 task 6).
    use_depth = fusion != "Baseline"
    cfg = Config(
        model=ModelConfig(use_depth=use_depth, fusion_type=fusion,
                          num_classes=3, remat=remat),
        train=TrainConfig(batch_size=B, train_dtype=train_dtype),
        data=DataConfig(use_depth=use_depth))
    model, criterion, _ = build_model(cfg)
    H, W, T = 608, 800, 16
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.standard_normal((B, H, W, 4 if use_depth else 3)).astype(np.float32),
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
    batch_dev = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    def body(i, s):
        s2, _ = step(s, batch_dev, key)
        return s2

    # n traced (fori_loop lowers to while): ONE compile serves warmup
    # and measurement
    loop = jax.jit(lambda s0, n: jax.lax.fori_loop(0, n, body, s0))
    s = loop(state, jnp.int32(2))  # compile + warmup
    float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    s = loop(state, jnp.int32(iters))
    float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
    dt = (time.perf_counter() - t0 - rpc) / iters
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtypes = ([sys.argv[3]] if len(sys.argv) > 3
              else ["float32", "bfloat16"])
    remat = len(sys.argv) > 4 and sys.argv[4] == "remat"
    fusion = sys.argv[5] if len(sys.argv) > 5 else "LateFusion"
    for td in dtypes:
        dt = measure(td, B, iters, remat=remat, fusion=fusion)
        print(f"train_dtype={td:9s} B={B} remat={remat} {fusion}: "
              f"{dt * 1e3:8.1f} ms/step ({B / dt:6.1f} frames/s)")


if __name__ == "__main__":
    main()
