"""Serving throughput vs batch size (round 3).

The headline bench (`bench.py`) serves at B=8. If the 608x800 forward
has per-program or tiling overheads that amortize with batch, a larger
serving batch raises frames/sec/chip on the same hardware — worth
measuring before calling the 36 ms forward a floor. Uses bench.py's
tunnel-safe fori_loop chain.

  python scripts/bench_serving_batch.py [batches...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from bench import measure
from dfvod_tpu.utils.config import ModelConfig


def main():
    batches = [int(b) for b in sys.argv[1:]] or [4, 8, 16, 24]
    rng = np.random.default_rng(0)
    lf = dict(use_depth=True, fusion_type="LateFusion",
              compute_dtype="bfloat16")
    for b in batches:
        fps, dt = measure(ModelConfig(**lf), batch_frames=b, rng=rng,
                          iters=max(8, 120 // b))
        print(f"B={b:3d}: {dt * 1e3:7.2f} ms/forward  "
              f"{fps:7.1f} frames/s  ({dt * 1e3 / b:.3f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
