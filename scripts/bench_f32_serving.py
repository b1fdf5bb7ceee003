"""f32 vs bf16 serving comparison (VERDICT r1 #5 target: f32 within
~1.5x of bf16 at B=8 608x800).

f32 serving previously fell back to the flat XLA gather (re-reads ~6.5x
the value tensor from HBM); the hat kernel now serves f32 via the
split-precision (hi/lo bf16, 3-matmul) path. Tunnel-safe chained-loop
timing (PERF.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 608, 800
ITERS = 30


def timed(fn, x, iters=ITERS):
    def chain(x0):
        def body(i, c):
            out = fn(c)
            # perturb the carry so dispatches aren't elided
            return c + (jnp.tanh(jnp.sum(out.astype(jnp.float32)))
                        * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x0)

    g = jax.jit(chain)
    g(x).block_until_ready()
    # rpc cost
    tiny = jax.jit(lambda a: a + 1)
    tiny(jnp.zeros(8)).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(tiny(jnp.zeros(8)))
    rpc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(g(x)).sum()
    dt = time.perf_counter() - t0 - rpc
    return dt / iters * 1000


def main():
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

    def fwd(dtype, impl_env):
        os.environ["DFVOD_MSDA_IMPL"] = impl_env
        v = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype in (jnp.float32,
                                                     jnp.bfloat16) else x,
            variables)

        def f(carry):
            img = (img0 + carry[0, 0, 0, 0] * 1e-6).astype(dtype)
            return model.apply(v, img, mask0,
                               train=False)["pred_logits"].astype(
                jnp.float32)
        ms = timed(f, img0.astype(dtype))
        del os.environ["DFVOD_MSDA_IMPL"]
        return ms

    bf16 = fwd(jnp.bfloat16, "")
    f32_hat = fwd(jnp.float32, "pallas_hat")
    f32_flat = fwd(jnp.float32, "flat")
    print(f"bf16 hat      : {bf16:7.2f} ms  ({B / bf16 * 1000:.1f} f/s)")
    print(f"f32 hat(split): {f32_hat:7.2f} ms  "
          f"({B / f32_hat * 1000:.1f} f/s, {f32_hat / bf16:.2f}x bf16)")
    print(f"f32 flat(XLA) : {f32_flat:7.2f} ms  "
          f"({B / f32_flat * 1000:.1f} f/s, {f32_flat / bf16:.2f}x bf16)")


if __name__ == "__main__":
    main()
