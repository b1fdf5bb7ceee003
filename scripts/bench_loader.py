"""Loader throughput guard (VERDICT r1 weak #4 / next #8).

Measures host-side batches/s of the thread-pool Loader with real JPEG
RGB + JPEG depth decode, the full train augmentation pipeline, and
static-bucket collation, and compares against the measured TPU train
step (106.5 ms at B=8 LateFusion bf16 608x800 -> 9.4 steps/s): the
loader must sustain >= 1.5x the step rate to keep the chip fed.

Run: python scripts/bench_loader.py [--data datasets/synth_rgbd]
           [--batch 8] [--workers 0 4 8] [--device-preprocess]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dfvod_tpu.data.dataset import CocoDetectionDataset
from dfvod_tpu.data.loader import Loader
from dfvod_tpu.data.transforms import TrainTransform


def run(data_root, batch, workers, device_preprocess, epochs=2):
    ds = CocoDetectionDataset(
        f"{data_root}/coco/images", f"{data_root}/coco/annotations/train.json",
        use_depth=True, train=True)
    tf = TrainTransform()  # 480-800 short side, max 1333 (reference aug)
    loader = Loader(ds, tf, batch_size=batch, use_depth=True, shuffle=True,
                    device_preprocess=device_preprocess,
                    num_workers=workers)
    # warm one epoch (page cache, pool spin-up), then time
    for _ in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        loader.set_epoch(n)
        for b in loader:
            n += 1
    dt = time.perf_counter() - t0
    return n / dt, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="datasets/synth_rgbd")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    p.add_argument("--step-ms", type=float, default=106.5,
                   help="measured TPU train-step latency to compare")
    p.add_argument("--device-preprocess", action="store_true", default=True)
    args = p.parse_args()
    step_rate = 1000.0 / args.step_ms
    print(f"TPU step rate: {step_rate:.1f} steps/s (at {args.step_ms} ms)")
    for w in args.workers:
        rate, n = run(args.data, args.batch, w, args.device_preprocess)
        print(f"num_workers={w}: {rate:.1f} batches/s over {n} batches "
              f"({rate / step_rate:.2f}x the step rate)")


if __name__ == "__main__":
    main()
