"""Benchmark — RGB-D frames/sec/chip, the BASELINE.json north-star metric.

TPU-native counterpart of the reference's ``benchmark.py:31-66``, measured
in production serving mode: bf16 MXU compute, uint8 frames with on-device
normalization (``data/device_pipeline.py``), batched for throughput.

Timing methodology (axon tunnel): ``block_until_ready`` does NOT block
through the remote PJRT tunnel and repeated same-input dispatches are
elided, so naive wall-clock loops report impossible numbers (measured
>30 PF/s on a 197 TF/s chip). Instead the N iterations run as ONE
``lax.fori_loop`` on device with a genuine data dependency between
iterations (the carry scalar perturbs the next input), and a single scalar
readback forces completion; the measured RPC round-trip cost is
subtracted. Cross-checked against MXU peak: a chained 4096^3 bf16 matmul
measures 179-192 TF/s on this v5e chip with the same method.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}``
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: the two model compiles dominate bench
# wall-clock (~5 min cold); warm re-runs take seconds
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from dfvod_tpu.data.device_pipeline import device_normalize
from dfvod_tpu.models import build_model
from dfvod_tpu.utils.config import Config, ModelConfig

H, W = 608, 800  # short-side-600 eval bucket (vid_single.py:152)


def _rpc_cost() -> float:
    """One scalar-readback round trip through the tunnel."""
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(model_cfg: ModelConfig, batch_frames: int, rng,
            iters: int = 15):
    """Returns (frames/sec, sec/forward) for one config."""
    model, _, _ = build_model(Config(model=model_cfg))
    imgs_u8 = jnp.asarray(
        rng.integers(0, 254, (batch_frames, H, W, 4)), jnp.uint8)
    sizes = jnp.tile(jnp.array([[H, W]]), (batch_frames, 1))

    img0, mask0 = device_normalize(imgs_u8, sizes)
    variables = jax.jit(lambda r: model.init(
        r, img0, mask0, train=False))(jax.random.PRNGKey(0))
    # serving mode: bf16 weights + activations (max box drift vs f32
    # measured 2.3e-3 normalized; +14% over f32-with-bf16-matmuls)
    variables = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(variables)

    def body(i, c):
        # carry -> input dependency defeats loop-invariant hoisting and
        # forces sequential execution of the chain
        x = imgs_u8 + (c > 0).astype(jnp.uint8)
        img, mask = device_normalize(x, sizes)
        out = model.apply(variables, img.astype(jnp.bfloat16), mask,
                          train=False)["pred_logits"]
        return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.float32(0.0), 2))        # compile + warm
    rpc = _rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), iters))
    dt = (time.perf_counter() - t0 - rpc) / iters
    return batch_frames / dt, dt


def _emit(fps_single, dt_single, fps_clip=None, dt_clip=None):
    value = (0.5 * (fps_single + fps_clip) if fps_clip is not None
             else fps_single)
    detail = {
        "single_frame_latefusion_fps_b8": round(fps_single, 1),
        "single_frame_batch8_ms": round(dt_single * 1e3, 3),
        "resolution": [H, W],
        "mode": "bf16 MXU, uint8 on-device preprocess, "
                "fori_loop-chained timing (tunnel-safe)",
        "device": str(jax.devices()[0]).split(":")[0],
    }
    if fps_clip is not None:
        detail["transvod_pp_2frame_clip_fps_4clips"] = round(fps_clip, 1)
        detail["clip_batch_latency_ms"] = round(dt_clip * 1e3, 3)
    else:
        detail["note"] = ("clip config skipped (timeout guard); value is "
                          "single-frame only")
    print(json.dumps({
        "metric": "rgbd_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(value, 1),
        "detail": detail,
    }), flush=True)


def main():
    import signal
    import sys
    rng = np.random.default_rng(0)
    lf = dict(use_depth=True, fusion_type="LateFusion",
              compute_dtype="bfloat16")

    # 1. single-frame LateFusion RGB-D detector, batch-8 throughput
    fps_single, dt_single = measure(ModelConfig(**lf), batch_frames=8,
                                    rng=rng)

    # timeout guard: if the harness SIGTERMs us during the (compile-heavy)
    # clip measurement, still emit the single-frame result
    def on_term(signum, frame):
        _emit(fps_single, dt_single)
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)

    # 2. TransVOD++ LateFusion: 4 clips x 2 frames per forward
    fps_clip, dt_clip = measure(
        ModelConfig(temporal_mode="transvod_pp", num_ref_frames=1, **lf),
        batch_frames=8, rng=rng)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    _emit(fps_single, dt_single, fps_clip, dt_clip)


if __name__ == "__main__":
    main()
