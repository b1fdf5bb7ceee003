"""Monocular depth map generation — ``depth_tools/rgb2d.py`` equivalent.

Runs a HuggingFace depth-estimation pipeline (default
``LiheYoung/depth-anything-small-hf``, ``rgb2d.py:27``) over an image tree
and writes min-max-normalized uint8 grayscale PNGs mirroring the input
layout — the ``depth_pred/`` convention the datasets expect
(``torchvision_datasets/coco.py:84``).

The model download requires network access; in zero-egress environments
pass a local ``--model`` path or pre-generate depth maps elsewhere.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

EXTENSIONS = (".png", ".jpg", ".jpeg")


def normalize_depth_to_uint8(depth: np.ndarray) -> np.ndarray:
    d = depth.astype(np.float32)
    rng = d.max() - d.min()
    if rng > 0:
        d = (d - d.min()) / rng
    else:
        d = np.zeros_like(d)
    return (d * 255).astype(np.uint8)


def convert_images_to_depth(input_dir: str, output_dir: str,
                            num_images: int | None = None,
                            model: str = "LiheYoung/depth-anything-small-hf",
                            pipe=None) -> int:
    """Returns the number of images processed. ``pipe`` may be injected
    (e.g. a stub in tests)."""
    if pipe is None:
        from transformers import pipeline
        pipe = pipeline(task="depth-estimation", model=model)

    inp, out = Path(input_dir), Path(output_dir)
    files = sorted(f for f in inp.rglob("*")
                   if f.suffix.lower() in EXTENSIONS)
    if num_images:
        files = files[:num_images]
    for path in files:
        image = Image.open(path)
        depth = np.array(pipe(image)["depth"])
        dst = out / path.relative_to(inp)
        dst.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(normalize_depth_to_uint8(depth)).save(dst)
    return len(files)


def main(argv=None):
    p = argparse.ArgumentParser("rgb2d")
    p.add_argument("input_dir")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_images", type=int, default=None)
    p.add_argument("--model", default="LiheYoung/depth-anything-small-hf")
    a = p.parse_args(argv)
    n = convert_images_to_depth(a.input_dir, a.output_dir, a.num_images,
                                a.model)
    print(f"Depth conversion completed: {n} images.")


if __name__ == "__main__":
    main()
