"""Backward-pass component profile on the real chip.

Splits the train step's time into forward vs backward per component
(backbone, depth path, full model+criterion) at the production train
shape, using the tunnel-safe chained fori_loop methodology (PERF.md).

Usage: python scripts/bench_train_backward.py [batch] [iters] [dtype]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def rpc_cost():
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_fn(fn, x, iters=12):
    """fn(x) -> scalar-reducible pytree; x perturbed per iteration."""
    def body(i, c):
        out = fn(x + c)
        s = sum(jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(out))
        return (jnp.tanh(s) * 1e-6).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.bfloat16(0.0), jnp.int32(iters)))
    return (time.perf_counter() - t0 - rpc) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    dt = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    cdt = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
    H, W = 608, 800
    rng = np.random.default_rng(0)
    to_c = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, t)

    rows = []

    def profile(name, apply_fn, params, x):
        fwd = measure_fn(lambda xx: apply_fn(params, xx), x, iters)

        def fb(xx):
            loss, grads = jax.value_and_grad(
                lambda p: sum(jnp.sum(t.astype(jnp.float32))
                              for t in jax.tree_util.tree_leaves(
                                  apply_fn(p, xx))))(params)
            return (loss, grads)

        both = measure_fn(fb, x, iters)
        rows.append((name, fwd * 1e3, both * 1e3, (both - fwd) * 1e3))
        print(f"{name:24s} fwd {fwd*1e3:7.2f} ms   fwd+bwd "
              f"{both*1e3:7.2f} ms   bwd {(both-fwd)*1e3:7.2f} ms",
              flush=True)

    # --- ResNet-50 trunk
    from dfvod_tpu.models.backbone_resnet import ResNet50
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), cdt)
    bb = ResNet50(dilation=True)
    vs = to_c(jax.jit(bb.init)(jax.random.PRNGKey(0), x))
    profile("resnet50", lambda p, xx: bb.apply(p, xx)[4], vs, x)

    # --- DFormer depth path
    from dfvod_tpu.models.backbone_dformer import DFormerDownsamplePath
    d = jnp.asarray(rng.standard_normal((B, H, W, 1)), cdt)
    dp = DFormerDownsamplePath()
    vsd = to_c(jax.jit(dp.init)(jax.random.PRNGKey(0), d))
    profile("dformer", lambda p, xx: dp.apply(p, xx), vsd, d)

    # --- full model fwd (LateFusion single-frame)
    from dfvod_tpu.models import build_model
    from dfvod_tpu.utils.config import Config, DataConfig, ModelConfig
    cfg = Config(model=ModelConfig(use_depth=True,
                                   fusion_type="LateFusion",
                                   num_classes=3,
                                   compute_dtype=dt),
                 data=DataConfig(use_depth=True))
    model, criterion, _ = build_model(cfg)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, 4)), cdt)
    mask = jnp.zeros((B, H, W), bool)
    vsm = to_c(jax.jit(lambda r: model.init(r, x4, mask, train=False))(
        jax.random.PRNGKey(0)))
    profile("model (no loss)",
            lambda p, xx: model.apply(p, xx, mask,
                                      train=False)["pred_boxes"], vsm, x4)

    # --- model + criterion (matcher included)
    T = 16
    targets = {
        "labels": jnp.full((B, T), 1, jnp.int32),
        "boxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.2], jnp.float32),
                          (B, T, 1)),
        "valid": jnp.tile(jnp.arange(T) < 2, (B, 1)),
    }

    def loss_fn(p, xx):
        out = model.apply(p, xx, mask, train=False)
        total, _ = criterion(out, targets)
        return total

    profile("model+criterion", loss_fn, vsm, x4)

    print("\ncomponent shares (bwd):")
    total_bwd = rows[-1][3]
    for name, f, b, bw in rows:
        print(f"  {name:24s} {bw:7.2f} ms  "
              f"({bw / total_bwd * 100:5.1f}% of full bwd)")


if __name__ == "__main__":
    main()
