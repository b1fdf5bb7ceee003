"""Paired RGB-D transforms — host-side numpy/PIL geometric ops with the
reference's semantics (``datasets/transforms_single.py``,
``transforms_multi.py``), producing static-shape padded arrays.

Reference contract preserved:
- train aug = RandomHorizontalFlip(0.5) + RandomResize(short side in
  480..800 step 32, max long side 1333) (``vid_single.py:144-151``)
- eval = Resize(short side 600, max 1333) (``vid_single.py:152-157``)
- Normalize: RGB ImageNet mean/std + depth (x-0.48)/0.28 (DFormer stats),
  boxes -> normalized cxcywh (``transforms_single.py:262-286``,
  ``vid_single.py:133-142``)
- clip transforms apply the SAME random draw to every frame
  (``transforms_multi.py``: list semantics)

Static shapes: instead of the reference's per-batch NestedTensor padding
(pad to batch max), images are padded up to a shape bucket — dims rounded
up to ``bucket_step`` and capped at ``max_size`` — so XLA compiles O(few)
programs (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)
DEPTH_MEAN, DEPTH_STD = 0.48, 0.28  # DFormer stats (vid_single.py:136)


def _use_native() -> bool:
    """Production default: the C++ resize/normalize/pad path
    (``native/preprocess.cpp``). ``DFVOD_NATIVE=0`` forces the PIL/numpy
    path (PIL resize uses an antialiasing filter when downscaling; the
    native path is plain half-pixel bilinear — cv2/torch semantics)."""
    if os.environ.get("DFVOD_NATIVE", "1") == "0":
        return False
    from dfvod_tpu.data import native
    return native.available()


def _resize_u8(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Half-pixel bilinear uint8 resize, fastest available backend.

    cv2's fixed-point SIMD INTER_LINEAR (same half-pixel convention)
    measured ~9x faster than the scalar C++ path on this host's single
    core (0.96 vs 8.8 ms for 320x256 -> 1000x800) — and resize was 64%
    of batch-prep time (scripts/bench_loader.py). ``DFVOD_CV2=0`` pins
    the C++ path (bit-stable float bilinear) for parity experiments."""
    if os.environ.get("DFVOD_CV2", "1") != "0":
        try:
            import cv2
            return cv2.resize(img, (nw, nh),
                              interpolation=cv2.INTER_LINEAR)
        except ImportError:
            pass
    from dfvod_tpu.data import native
    out = native.resize_bilinear_u8(img, nh, nw)
    return out[..., 0] if img.ndim == 2 else out


@dataclasses.dataclass
class Sample:
    """One frame + targets, boxes in absolute xyxy until Normalize."""
    rgb: np.ndarray                     # (H, W, 3) uint8
    depth: Optional[np.ndarray]         # (H, W) uint8 or None
    boxes: np.ndarray                   # (T, 4) xyxy float32
    labels: np.ndarray                  # (T,) int64
    image_id: int = 0
    orig_size: Tuple[int, int] = (0, 0)  # (H, W)
    masks: Optional[np.ndarray] = None  # (T, H, W) uint8 {0,1} or None


def resize_short_side(h: int, w: int, short: int, max_size: int
                      ) -> Tuple[int, int]:
    """torchvision ``RandomResize`` target size: scale so the short side is
    ``short`` unless the long side would exceed ``max_size``."""
    mn, mx = min(h, w), max(h, w)
    if mx / mn * short > max_size:
        short = int(round(max_size * mn / mx))
    if (h <= w and h == short) or (w <= h and w == short):
        return h, w
    if h < w:
        return short, int(short * w / h)
    return int(short * h / w), short


def _resize_masks(masks: Optional[np.ndarray], nh: int, nw: int
                  ) -> Optional[np.ndarray]:
    """Nearest-neighbour resize of an instance-mask stack with torch's
    legacy ``interpolate(mode='nearest')`` index map (``src = floor(dst *
    scale)``), matching the reference's mask resizing in
    ``transforms_single.py`` (F.interpolate on ``masks[:, None]``)."""
    if masks is None:
        return None
    t, h, w = masks.shape
    if (h, w) == (nh, nw):
        return masks
    ri = np.minimum((np.arange(nh) * (h / nh)).astype(np.int64), h - 1)
    ci = np.minimum((np.arange(nw) * (w / nw)).astype(np.int64), w - 1)
    return masks[:, ri][:, :, ci]


def _resize(sample: Sample, short: int, max_size: int) -> Sample:
    h, w = sample.rgb.shape[:2]
    nh, nw = resize_short_side(h, w, short, max_size)
    if (nh, nw) == (h, w):
        return sample
    if _use_native():
        rgb = _resize_u8(sample.rgb, nh, nw)
        depth = sample.depth
        if depth is not None:
            depth = _resize_u8(depth, nh, nw)
        boxes = sample.boxes * np.array([nw / w, nh / h, nw / w, nh / h],
                                        np.float32)
        return dataclasses.replace(sample, rgb=rgb, depth=depth,
                                   boxes=boxes,
                                   masks=_resize_masks(sample.masks, nh, nw))
    rgb = np.asarray(Image.fromarray(sample.rgb).resize(
        (nw, nh), Image.BILINEAR))
    depth = sample.depth
    if depth is not None:
        depth = np.asarray(Image.fromarray(depth).resize(
            (nw, nh), Image.BILINEAR))
    boxes = sample.boxes * np.array([nw / w, nh / h, nw / w, nh / h],
                                    np.float32)
    return dataclasses.replace(sample, rgb=rgb, depth=depth, boxes=boxes,
                               masks=_resize_masks(sample.masks, nh, nw))


def _hflip(sample: Sample) -> Sample:
    h, w = sample.rgb.shape[:2]
    rgb = sample.rgb[:, ::-1]
    depth = sample.depth[:, ::-1] if sample.depth is not None else None
    boxes = sample.boxes.copy()
    boxes[:, [0, 2]] = w - sample.boxes[:, [2, 0]]
    masks = sample.masks[:, :, ::-1] if sample.masks is not None else None
    return dataclasses.replace(sample, rgb=rgb, depth=depth, boxes=boxes,
                               masks=masks)


def bucket_shape(h: int, w: int, bucket_step: int = 128,
                 max_size: int = 1344) -> Tuple[int, int]:
    up = lambda v: min(int(np.ceil(v / bucket_step)) * bucket_step,  # noqa
                       max_size)
    return up(h), up(w)


def normalize_and_pad(sample: Sample, pad_hw: Tuple[int, int],
                      use_depth: bool, max_boxes: int):
    """-> dict(image (Hp,Wp,C) f32, mask (Hp,Wp) bool True=pad,
    labels (T,), boxes (T,4) normalized cxcywh, valid (T,))."""
    h, w = sample.rgb.shape[:2]
    ph, pw = pad_hw
    assert ph >= h and pw >= w, ((h, w), pad_hw)
    if use_depth:
        assert sample.depth is not None, "use_depth without depth map"
    if _use_native():
        from dfvod_tpu.data import native
        mean = np.concatenate([RGB_MEAN, [DEPTH_MEAN]]) if use_depth \
            else RGB_MEAN
        std = np.concatenate([RGB_STD, [DEPTH_STD]]) if use_depth \
            else RGB_STD
        out, mask = native.preprocess_rgbd(
            sample.rgb, sample.depth if use_depth else None,
            (h, w), (ph, pw), mean, std)
    else:
        rgb = (sample.rgb.astype(np.float32) / 255.0 - RGB_MEAN) / RGB_STD
        chans = [rgb]
        if use_depth:
            d = ((sample.depth.astype(np.float32) / 255.0 - DEPTH_MEAN)
                 / DEPTH_STD)
            chans.append(d[..., None])
        img = np.concatenate(chans, -1)
        out = np.zeros((ph, pw, img.shape[-1]), np.float32)
        out[:h, :w] = img
        mask = np.ones((ph, pw), bool)
        mask[:h, :w] = False

    # boxes: xyxy -> cxcywh normalized by the *unpadded* size
    # (``transforms_single.py:262-286``)
    t = len(sample.boxes)
    boxes = np.zeros((max_boxes, 4), np.float32)
    labels = np.zeros((max_boxes,), np.int64)
    valid = np.zeros((max_boxes,), bool)
    n = min(t, max_boxes)
    if n:
        b = sample.boxes[:n]
        cxcywh = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                           b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)
        boxes[:n] = cxcywh / np.array([w, h, w, h], np.float32)
        labels[:n] = sample.labels[:n]
        valid[:n] = True
    ret = {"image": out, "mask": mask, "labels": labels, "boxes": boxes,
           "valid": valid, "image_id": sample.image_id,
           "size": np.array([h, w], np.int64),
           "orig_size": np.array(sample.orig_size, np.int64)}
    if sample.masks is not None:
        m = np.zeros((max_boxes, ph, pw), np.uint8)
        if n:
            m[:n, :h, :w] = sample.masks[:n]
        ret["masks"] = m
    return ret


def pad_u8(sample: Sample, pad_hw: Tuple[int, int], use_depth: bool,
           max_boxes: int, out_img: Optional[np.ndarray] = None):
    """uint8 variant of ``normalize_and_pad`` for the on-device pipeline
    (``data/device_pipeline.py``): pads raw uint8 RGB(-D) into the bucket
    and defers [0,1]+mean/std normalization + mask construction to the
    device. Targets are identical to the host path.

    ``out_img``: optional pre-zeroed (ph, pw, C) slice of the batch
    canvas — the collator passes one so frames are written in place,
    skipping the per-frame allocation + the 26 MB/batch ``np.stack``
    copy (single-core host, every memcpy counts)."""
    h, w = sample.rgb.shape[:2]
    ph, pw = pad_hw
    assert ph >= h and pw >= w, ((h, w), pad_hw)
    C = 4 if use_depth else 3
    out = np.zeros((ph, pw, C), np.uint8) if out_img is None else out_img
    if use_depth:
        assert sample.depth is not None, "use_depth without depth map"
        # RGB into 3 of 4 interleaved channels is an element-wise strided
        # scatter in numpy (4.4 ms/frame at 800x1000 on one core); the
        # native interleave is a linear pass (~1 ms)
        if _use_native() and out.flags.c_contiguous:
            from dfvod_tpu.data import native
            native.pack_rgbd_u8(sample.rgb, sample.depth, out)
        else:
            out[:h, :w, :3] = sample.rgb
            out[:h, :w, 3] = sample.depth
    else:
        out[:h, :w, :] = sample.rgb

    t = len(sample.boxes)
    boxes = np.zeros((max_boxes, 4), np.float32)
    labels = np.zeros((max_boxes,), np.int64)
    valid = np.zeros((max_boxes,), bool)
    n = min(t, max_boxes)
    if n:
        b = sample.boxes[:n]
        cxcywh = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                           b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)
        boxes[:n] = cxcywh / np.array([w, h, w, h], np.float32)
        labels[:n] = sample.labels[:n]
        valid[:n] = True
    ret = {"image": out, "labels": labels, "boxes": boxes,
           "valid": valid, "image_id": sample.image_id,
           "size": np.array([h, w], np.int64),
           "orig_size": np.array(sample.orig_size, np.int64)}
    if sample.masks is not None:
        m = np.zeros((max_boxes, ph, pw), np.uint8)
        if n:
            m[:n, :h, :w] = sample.masks[:n]
        ret["masks"] = m
    return ret


@dataclasses.dataclass
class TrainTransform:
    """HFlip + multi-scale resize; one random draw shared across a clip.

    ``strong_aug`` prepends the reference's library extras — photometric
    distortion then MinIoURandomCrop (``transforms_multi.py:254-398``) —
    clip-consistently. Off by default (the reference's production
    pipeline is HFlip + RandomResize only, ``vid_single.py:144-157``).
    """
    short_sides: Sequence[int] = tuple(range(480, 801, 32))
    max_size: int = 1333
    bucket_step: int = 128
    pad_cap: int = 1344
    strong_aug: bool = False

    def __call__(self, frames: List[Sample], rng: np.random.Generator
                 ) -> List[Sample]:
        if self.strong_aug:
            from dfvod_tpu.data.photometric import (
                MinIoURandomCrop,
                PhotometricDistortion,
            )
            frames = PhotometricDistortion()(frames, rng)
            frames = MinIoURandomCrop()(frames, rng)
        flip = rng.random() < 0.5
        short = int(rng.choice(np.asarray(self.short_sides)))
        out = []
        for s in frames:
            if flip:
                s = _hflip(s)
            out.append(_resize(s, short, self.max_size))
        return out


@dataclasses.dataclass
class EvalTransform:
    short_side: int = 600
    max_size: int = 1333
    bucket_step: int = 128
    pad_cap: int = 1344

    def __call__(self, frames: List[Sample],
                 rng: Optional[np.random.Generator] = None) -> List[Sample]:
        return [_resize(s, self.short_side, self.max_size) for s in frames]
