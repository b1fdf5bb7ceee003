"""Benchmark — RGB-D frames/sec/chip, the BASELINE.json north-star metric.

TPU-native counterpart of the reference's ``benchmark.py:31-66`` (warmup +
synchronized average forward latency -> FPS). Measures the flagship
LateFusion RGB-D single-frame model and a 2-frame clip forward at the
reference's eval resolution contract (short side 600, here the 608x800
static bucket), bf16 compute.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}``
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.models import build_model
from dfvod_tpu.utils.config import Config, ModelConfig


def bench_forward(model, variables, images, mask, iters=30, warmup=5):
    fn = jax.jit(lambda v, x, m: model.apply(
        v, x, m, train=False)["pred_logits"])
    out = fn(variables, images, mask)
    out.block_until_ready()
    for _ in range(warmup):
        fn(variables, images, mask).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, images, mask)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return images.shape[0] / dt  # frames/sec


def main():
    rng = np.random.default_rng(0)
    H, W = 608, 800  # short-side-600 eval bucket (vid_single.py:152)

    def inputs(b):
        images = jnp.asarray(rng.standard_normal((b, H, W, 4)), jnp.float32)
        return images, jnp.zeros((b, H, W), bool)

    # 1. single-frame LateFusion RGB-D detector
    cfg = Config(model=ModelConfig(use_depth=True, fusion_type="LateFusion",
                                   compute_dtype="bfloat16"))
    model, _, _ = build_model(cfg)
    images, mask = inputs(1)
    variables = jax.jit(lambda r: model.init(
        r, images, mask, train=False))(jax.random.PRNGKey(0))
    fps_single = bench_forward(model, variables, *inputs(1))

    # 2. TransVOD++ LateFusion, one 2-frame RGB-D clip per forward
    #    (the BASELINE.json north-star config)
    cfg_v = Config(model=ModelConfig(
        use_depth=True, fusion_type="LateFusion",
        temporal_mode="transvod_pp", num_ref_frames=1,
        compute_dtype="bfloat16"))
    model_v, _, _ = build_model(cfg_v)
    images, mask = inputs(2)
    variables_v = jax.jit(lambda r: model_v.init(
        r, images, mask, train=False))(jax.random.PRNGKey(0))
    fps_clip = bench_forward(model_v, variables_v, *inputs(2))

    value = 0.5 * (fps_single + fps_clip)
    # no published reference speed (BASELINE.md): vs_baseline anchored to
    # the reference benchmark tool's protocol, reported as ratio vs 1.0
    # placeholder until a measured torch number exists.
    print(json.dumps({
        "metric": "rgbd_frames_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(value, 3),
        "detail": {"single_frame_latefusion_fps": round(fps_single, 3),
                   "transvod_pp_2frame_clip_fps": round(fps_clip, 3),
                   "resolution": [H, W],
                   "device": str(jax.devices()[0]).split(":")[0]},
    }))


if __name__ == "__main__":
    main()
