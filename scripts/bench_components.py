"""Serving component breakdown on the real chip (tunnel-safe chaining).

Times the bf16 serving forward of each heavy component at the production
B=8 608x800 single-frame shape to direct optimization effort.
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


def measure(fn, x, iters=20):
    def body(i, c):
        out = fn(x + c)
        return (jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(
        0, n, body, c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.bfloat16(0.0), jnp.int32(iters)))
    return (time.perf_counter() - t0 - rpc) / iters


def main():
    B, H, W = 8, 608, 800
    rng = np.random.default_rng(0)
    to16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)

    from dfvod_tpu.models.backbone_resnet import ResNet50
    rgb = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    bb = ResNet50(dilation=True)
    vs = to16(jax.jit(bb.init)(jax.random.PRNGKey(0), rgb))
    f = jax.jit(lambda x: bb.apply(vs, x)[4])
    print(f"resnet50 B={B}: {measure(f, rgb) * 1e3:7.2f} ms", flush=True)
    for st in (1, 2, 3):
        bbs = ResNet50(dilation=True, return_stages=(st,))
        fs = jax.jit(lambda x, m=bbs: m.apply(vs, x)[st])
        print(f"  thru layer{st}: {measure(fs, rgb) * 1e3:7.2f} ms",
              flush=True)

    from dfvod_tpu.models.backbone_dformer import DFormerBackbone
    d = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.bfloat16)
    dmask = jnp.zeros((B, H, W), bool)
    db = DFormerBackbone()
    vs2 = to16(jax.jit(db.init)(jax.random.PRNGKey(0), d, dmask))
    f2s = jax.jit(lambda x: jax.tree_util.tree_leaves(
        db.apply(vs2, x, dmask))[0])
    print(f"dformer  B={B}: {measure(f2s, d) * 1e3:7.2f} ms", flush=True)

    from dfvod_tpu.models import build_model
    from dfvod_tpu.utils.config import Config, ModelConfig
    cfg = Config(model=ModelConfig(use_depth=True,
                                   fusion_type="LateFusion",
                                   num_classes=3,
                                   compute_dtype="bfloat16"))
    model, _, _ = build_model(cfg)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, 4)), jnp.bfloat16)
    mask = jnp.zeros((B, H, W), bool)
    vsm = to16(jax.jit(lambda r: model.init(r, x4, mask, train=False))(
        jax.random.PRNGKey(0)))
    fm = jax.jit(lambda x: model.apply(vsm, x, mask,
                                       train=False)["pred_boxes"])
    print(f"full fwd B={B}: {measure(fm, x4) * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
