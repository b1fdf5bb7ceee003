"""Photometric / cropping clip augmentations — numpy equivalents of the
reference's extra (library) transforms in ``datasets/transforms_multi.py``:
``MinIoURandomCrop`` (``:254``), contrast / brightness / saturation / hue /
lighting-noise (``:314-398``). Not part of the production training pipeline
(``make_coco_transforms`` uses only HFlip + RandomResize, ``vid_multi.py:
268-273``) but kept available for experimentation.

All ops take a list of ``Sample`` frames and one ``np.random.Generator``;
the random draw is shared across the clip (clip-consistent semantics).
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from dfvod_tpu.data.transforms import Sample


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ix = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0])).clip(0)
    iy = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1])).clip(0)
    inter = ix * iy
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter,
                              1e-9)


@dataclasses.dataclass
class MinIoURandomCrop:
    """``transforms_multi.py:254-312``: sample a crop whose IoU with every
    box exceeds a randomly chosen threshold and that contains every box
    center; boxes are clipped and shifted."""
    min_ious: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.9)
    min_crop_size: float = 0.3
    max_tries: int = 50

    def __call__(self, frames: List[Sample], rng: np.random.Generator
                 ) -> List[Sample]:
        h, w = frames[0].rgb.shape[:2]
        mode = rng.choice((1.0, *self.min_ious, 0.0))
        if mode == 1.0:
            return frames
        boxes = frames[0].boxes
        for _ in range(self.max_tries):
            nw = rng.uniform(self.min_crop_size * w, w)
            nh = rng.uniform(self.min_crop_size * h, h)
            if nh / nw < 0.5 or nh / nw > 2:
                continue
            left = rng.uniform(0, w - nw)
            top = rng.uniform(0, h - nh)
            patch = np.array([int(left), int(top), int(left + nw),
                              int(top + nh)], np.float32)
            if patch[2] <= patch[0] or patch[3] <= patch[1]:
                continue
            if len(boxes):
                overlaps = _iou_xyxy(patch[None], boxes).reshape(-1)
                if overlaps.min() < mode:
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                inside = ((centers > patch[:2]) & (centers < patch[2:])
                          ).all(axis=1)
                if not inside.all():
                    continue
            x0, y0, x1, y1 = patch.astype(int)
            out = []
            for f in frames:
                b = f.boxes.copy()
                if len(b):
                    b[:, 2:] = b[:, 2:].clip(max=patch[2:])
                    b[:, :2] = b[:, :2].clip(min=patch[:2])
                    b -= np.tile(patch[:2], 2)
                out.append(dataclasses.replace(
                    f, rgb=f.rgb[y0:y1, x0:x1],
                    depth=(f.depth[y0:y1, x0:x1]
                           if f.depth is not None else None),
                    boxes=b, orig_size=(y1 - y0, x1 - x0)))
            return out
        return frames


def _apply_rgb(frames, fn):
    return [dataclasses.replace(
        f, rgb=np.clip(fn(f.rgb.astype(np.float32)), 0, 255
                       ).astype(np.uint8)) for f in frames]


@dataclasses.dataclass
class RandomContrast:
    lower: float = 0.5
    upper: float = 1.5

    def __call__(self, frames, rng):
        if rng.integers(2):
            alpha = rng.uniform(self.lower, self.upper)
            return _apply_rgb(frames, lambda x: x * alpha)
        return frames


@dataclasses.dataclass
class RandomBrightness:
    delta: float = 32.0

    def __call__(self, frames, rng):
        if rng.integers(2):
            d = rng.uniform(-self.delta, self.delta)
            return _apply_rgb(frames, lambda x: x + d)
        return frames


def _rgb_to_hsv(x):
    import colorsys  # noqa: F401  (documenting the convention)
    import cv2
    return cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2HSV_FULL
                        ).astype(np.float32)


def _hsv_to_rgb(x):
    import cv2
    return cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                        cv2.COLOR_HSV2RGB_FULL)


@dataclasses.dataclass
class RandomSaturation:
    """Scales the HSV saturation channel (``:340-351``)."""
    lower: float = 0.5
    upper: float = 1.5

    def __call__(self, frames, rng):
        if rng.integers(2):
            alpha = rng.uniform(self.lower, self.upper)

            def fn(x):
                hsv = _rgb_to_hsv(x)
                hsv[..., 1] = np.clip(hsv[..., 1] * alpha, 0, 255)
                return _hsv_to_rgb(hsv).astype(np.float32)

            return _apply_rgb(frames, fn)
        return frames


@dataclasses.dataclass
class RandomHue:
    """Shifts the HSV hue channel (``:353-367``)."""
    delta: float = 18.0

    def __call__(self, frames, rng):
        if rng.integers(2):
            d = rng.uniform(-self.delta, self.delta) * 255.0 / 360.0

            def fn(x):
                hsv = _rgb_to_hsv(x)
                hsv[..., 0] = (hsv[..., 0] + d) % 255.0
                return _hsv_to_rgb(hsv).astype(np.float32)

            return _apply_rgb(frames, fn)
        return frames


_PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
          (2, 1, 0))


@dataclasses.dataclass
class RandomLightingNoise:
    """Random RGB channel permutation (``:369-380``)."""

    def __call__(self, frames, rng):
        if rng.integers(2):
            perm = _PERMS[rng.integers(len(_PERMS))]
            return _apply_rgb(frames, lambda x: x[..., list(perm)])
        return frames


@dataclasses.dataclass
class PhotometricDistortion:
    """The full distortion stack in the reference's order."""
    ops: tuple = (RandomBrightness(), RandomContrast(), RandomSaturation(),
                  RandomHue(), RandomLightingNoise())

    def __call__(self, frames, rng):
        for op in self.ops:
            frames = op(frames, rng)
        return frames
