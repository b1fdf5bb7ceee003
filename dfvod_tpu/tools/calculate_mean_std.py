"""Dataset mean/std calculator — ``depth_tools/calculate_mean_std.py``
equivalent: streams an image tree and prints per-channel mean/std in [0,1]
(the numbers that feed ``DataConfig.rgb_mean`` / ``depth_mean``)."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

EXTENSIONS = (".png", ".jpg", ".jpeg")


def compute_mean_std(input_dir: str, grayscale: bool = False):
    total = np.zeros(1 if grayscale else 3, np.float64)
    total_sq = np.zeros_like(total)
    count = 0
    for f in sorted(Path(input_dir).rglob("*")):
        if f.suffix.lower() not in EXTENSIONS:
            continue
        img = Image.open(f).convert("L" if grayscale else "RGB")
        a = np.asarray(img, np.float64) / 255.0
        a = a.reshape(-1, 1 if grayscale else 3)
        total += a.sum(0)
        total_sq += (a ** 2).sum(0)
        count += a.shape[0]
    mean = total / max(count, 1)
    std = np.sqrt(np.maximum(total_sq / max(count, 1) - mean ** 2, 0))
    return mean, std


def main(argv=None):
    p = argparse.ArgumentParser("calculate_mean_std")
    p.add_argument("input_dir")
    p.add_argument("--grayscale", action="store_true",
                   help="single-channel (depth) statistics")
    a = p.parse_args(argv)
    mean, std = compute_mean_std(a.input_dir, a.grayscale)
    print(f"mean: {mean.tolist()}")
    print(f"std:  {std.tolist()}")


if __name__ == "__main__":
    main()
