"""Benchmark CLI — ``benchmark.py`` equivalent: average forward latency
over N iterations with warmup + device sync, prints FPS
(``benchmark.py:31-66``). Accepts the full model flag surface, so any
fusion/temporal configuration can be measured.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.cli.flags import config_from_args, get_args_parser
from dfvod_tpu.models import build_model


def measure_average_inference_time(fn, args, num_iters: int = 100,
                                   warm_iters: int = 5) -> float:
    """``benchmark.py:31-43`` with ``block_until_ready`` as the TPU
    ``cuda.synchronize``."""
    for _ in range(warm_iters):
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(num_iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / num_iters


def main(argv=None):
    from dfvod_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(
        "dfvod_tpu benchmark", parents=[get_args_parser(video=True)])
    parser.add_argument("--num_iters", default=100, type=int)
    parser.add_argument("--warm_iters", default=5, type=int)
    parser.add_argument("--height", default=608, type=int)
    parser.add_argument("--width", default=800, type=int)
    parser.add_argument("--profile_dir", default="", type=str,
                        help="capture a jax.profiler trace of the timed "
                             "loop (view with tensorboard / xprof)")
    args = parser.parse_args(argv)
    video = "multi" in args.dataset_file
    cfg = config_from_args(args, video=video)

    model, _, _ = build_model(cfg)
    frames = (1 + cfg.model.num_ref_frames) if video else 1
    rng = np.random.default_rng(0)
    C = 4 if cfg.data.use_depth or cfg.model.use_depth else 3
    images = jnp.asarray(
        rng.standard_normal((frames, args.height, args.width, C)),
        jnp.float32)
    mask = jnp.zeros((frames, args.height, args.width), bool)
    variables = jax.jit(lambda r: model.init(
        r, images, mask, train=False))(jax.random.PRNGKey(0))
    fn = jax.jit(lambda v, x, m: model.apply(
        v, x, m, train=False)["pred_logits"])

    if args.profile_dir:
        # SURVEY.md §5: the reference has no profiler; this is the TPU
        # tracing hook (replaces the commented time.time() probes)
        with jax.profiler.trace(args.profile_dir):
            t = measure_average_inference_time(
                fn, (variables, images, mask), args.num_iters,
                args.warm_iters)
        print(f"profile written to {args.profile_dir}")
    else:
        t = measure_average_inference_time(fn, (variables, images, mask),
                                           args.num_iters, args.warm_iters)
    print(f"Average inference time: {t * 1e3:.3f} ms "
          f"({frames / t:.1f} frames/s, device "
          f"{jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
