"""RGB-D COCO datasets — single-frame and video (clip) variants.

Parity targets: ``datasets/torchvision_datasets/coco.py`` (paired RGB +
depth loading with the ``images -> depth_pred`` path substitution and
per-image min-max depth normalization), ``datasets/vid_single.py`` (target
prep + transforms + 4-channel concat) and ``datasets/vid_multi.py``
(reference-frame sampling: train = nearest +-num_ref_frames id window
excluding the key frame, eval = one-sided stride ``max(len//16, 1)``
sampling; still images with ``video_id == -1`` replicate the key frame).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from PIL import Image

from dfvod_tpu.data.coco import COCO, CocoVID
from dfvod_tpu.data.transforms import (
    EvalTransform,
    Sample,
    TrainTransform,
)


def load_depth(path: str) -> np.ndarray:
    """Reference ``get_depth`` (``torchvision_datasets/coco.py:75-105``):
    read unchanged, reject 3-channel, min-max normalize to uint8."""
    import cv2
    depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(path)
    if depth.ndim == 3:
        raise ValueError(f"depth image has {depth.shape[-1]} channels: "
                         f"{path} (expected single-channel)")
    d = depth.astype(np.float32)
    rng = d.max() - d.min()
    if rng > 0:
        d = (d - d.min()) / rng
    else:
        d = np.zeros_like(d)
    return (d * 255).astype(np.uint8)


def depth_path_for(image_path: str) -> str:
    """``images -> depth_pred`` substitution
    (``torchvision_datasets/coco.py:84``)."""
    return image_path.replace("images", "depth_pred")


def _decode_rle_counts(s) -> List[int]:
    """COCO compressed-RLE ``counts`` string decoder (pycocotools
    ``rleFrString`` codec, reimplemented from the format spec): 5-bit
    little-endian chunks biased by 48, bit 5 = continuation, sign-extend
    on bit 4 of the last chunk, deltas from ``counts[i-2]`` for i>2."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x, k, more = 0, 0, True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rasterize_segmentation(seg, h: int, w: int) -> np.ndarray:
    """COCO ``segmentation`` -> (h, w) uint8 {0,1} mask without
    pycocotools. Polygon lists rasterize via PIL scanline fill (pixel
    boundary placement can differ from pycocotools by <=1px on edges);
    RLE dicts (uncompressed list or compressed string ``counts``) decode
    exactly — COCO RLE runs are column-major."""
    if isinstance(seg, list):  # list of flat [x0,y0,x1,y1,...] polygons
        from PIL import ImageDraw
        img = Image.new("L", (w, h), 0)
        draw = ImageDraw.Draw(img)
        for poly in seg:
            xy = [(float(poly[i]), float(poly[i + 1]))
                  for i in range(0, len(poly) - 1, 2)]
            if len(xy) >= 3:
                draw.polygon(xy, outline=1, fill=1)
        return np.asarray(img, np.uint8)
    counts = seg["counts"]
    rh, rw = seg["size"]
    if isinstance(counts, (str, bytes)):
        counts = _decode_rle_counts(counts)
    flat = np.zeros(rh * rw, np.uint8)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(rw, rh).T[:h, :w]


def prepare_targets(anns: List[dict], h: int, w: int,
                    return_masks: bool = False):
    """``ConvertCocoPolysToMask`` semantics (``vid_single.py:65-127``):
    xywh -> xyxy, clamp to image, drop crowd + degenerate boxes; with
    ``return_masks`` also rasterize per-instance segmentation masks
    filtered by the same keep vector."""
    anns = [a for a in anns if a.get("iscrowd", 0) == 0]
    boxes = np.array([a["bbox"] for a in anns],
                     np.float32).reshape(-1, 4)
    boxes[:, 2:] += boxes[:, :2]
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
    labels = np.array([a["category_id"] for a in anns], np.int64)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    if not return_masks:
        return boxes[keep], labels[keep]
    if anns:
        masks = np.stack([rasterize_segmentation(a["segmentation"], h, w)
                          for a in anns])
    else:
        masks = np.zeros((0, h, w), np.uint8)
    return boxes[keep], labels[keep], masks[keep]


class CocoDetectionDataset:
    """Single-frame dataset. ``__getitem__`` returns a list with one
    ``Sample`` (clip of length 1) — the video dataset returns longer clips
    through the same interface."""

    def __init__(self, img_folder: str, ann_file: str, *,
                 use_depth: bool = False, train: bool = True,
                 depth_folder: Optional[str] = None,
                 cache_mode: bool = False, cache_rank: int = 0,
                 cache_world: int = 1, return_masks: bool = False):
        self.root = img_folder
        self.coco = COCO(ann_file)
        self.ids = sorted(self.coco.imgs)
        self.use_depth = use_depth
        self.train = train
        self.depth_folder = depth_folder
        self.return_masks = return_masks
        # in-RAM byte cache sharded across local workers
        # (``torchvision_datasets/coco.py:51-58`` + NodeDistributedSampler
        # pairing, ``datasets/samplers.py:75-139``)
        self._cache: Optional[dict] = None
        if cache_mode:
            self._cache = {}
            for i, img_id in enumerate(self.ids):
                if i % cache_world != cache_rank:
                    continue
                info = self.coco.loadImgs(img_id)[0]
                path = os.path.join(self.root, info["file_name"])
                with open(path, "rb") as f:
                    self._cache[img_id] = f.read()

    def _open_rgb(self, img_id: int, path: str) -> Image.Image:
        if self._cache is not None and img_id in self._cache:
            import io
            return Image.open(io.BytesIO(self._cache[img_id]))
        return Image.open(path)

    def __len__(self):
        return len(self.ids)

    def _load_frame(self, img_id: int) -> Sample:
        info = self.coco.loadImgs(img_id)[0]
        path = os.path.join(self.root, info["file_name"])
        rgb = np.asarray(self._open_rgb(img_id, path).convert("RGB"))
        depth = None
        if self.use_depth:
            dpath = (os.path.join(self.depth_folder, info["file_name"])
                     if self.depth_folder else depth_path_for(path))
            depth = load_depth(dpath)
        h, w = rgb.shape[:2]
        anns = self.coco.imgToAnns[img_id]
        masks = None
        if self.return_masks:
            boxes, labels, masks = prepare_targets(anns, h, w,
                                                   return_masks=True)
        else:
            boxes, labels = prepare_targets(anns, h, w)
        return Sample(rgb=rgb, depth=depth, boxes=boxes, labels=labels,
                      image_id=img_id, orig_size=(h, w), masks=masks)

    def __getitem__(self, index: int) -> List[Sample]:
        return [self._load_frame(self.ids[index])]


class CocoVideoDataset(CocoDetectionDataset):
    """Video dataset: key frame + ``num_ref_frames`` reference frames.

    Reproduces the reference's id-arithmetic sampling exactly
    (``vid_multi.py:74-125``) including its assumption of contiguous image
    ids within a video.
    """

    def __init__(self, img_folder: str, ann_file: str, *,
                 num_ref_frames: int = 3, use_depth: bool = False,
                 train: bool = True, depth_folder: Optional[str] = None,
                 filter_key_img: bool = True, cache_mode: bool = False,
                 cache_rank: int = 0, cache_world: int = 1,
                 return_masks: bool = False):
        super().__init__(img_folder, ann_file, use_depth=use_depth,
                         train=train, depth_folder=depth_folder,
                         cache_mode=cache_mode, cache_rank=cache_rank,
                         cache_world=cache_world, return_masks=return_masks)
        self.coco = CocoVID(ann_file)
        self.ids = sorted(self.coco.imgs)
        self.num_ref_frames = num_ref_frames
        self.filter_key_img = filter_key_img

    def _ref_ids(self, img_id: int) -> List[int]:
        video_id = self.coco.imgs[img_id].get("video_id", -1)
        if video_id == -1:
            return [img_id] * self.num_ref_frames
        img_ids = self.coco.get_img_ids_from_vid(video_id)
        if self.train:
            interval = self.num_ref_frames
            left = max(img_ids[0], img_id - interval)
            right = min(img_ids[-1], img_id + interval)
            sample_range = list(range(left, right + 1))
            if self.filter_key_img and img_id in sample_range:
                sample_range.remove(img_id)
            while 0 < len(sample_range) < self.num_ref_frames:
                sample_range.extend(sample_range)
            return sample_range[:self.num_ref_frames] or \
                [img_id] * self.num_ref_frames
        # eval: one-sided strided sampling (``vid_multi.py:108-125``)
        interval = max(len(img_ids) // 16, 1)
        left_index = (img_id - img_ids[0]) // interval
        refs = []
        if left_index < self.num_ref_frames:
            for i in range(self.num_ref_frames):
                refs.append(min(img_id + (i + 1) * interval, img_ids[-1]))
        else:
            for i in range(self.num_ref_frames):
                refs.append(max(img_id - (i + 1) * interval, img_ids[0]))
        if self.filter_key_img and img_id in refs:
            refs.remove(img_id)
        while 0 < len(refs) < self.num_ref_frames:
            refs.extend(refs)
        return refs[:self.num_ref_frames] or [img_id] * self.num_ref_frames

    def __getitem__(self, index: int) -> List[Sample]:
        key = self.ids[index]
        frames = [self._load_frame(key)]
        for rid in self._ref_ids(key):
            if rid in self.coco.imgs:
                frames.append(self._load_frame(rid))
            else:  # id gap: fall back to the key frame
                frames.append(frames[0])
        return frames


def build_dataset(image_set: str, cfg, temporal: bool = False):
    """``datasets/__init__.py:28-42`` equivalent: resolve the reference's
    hard-coded path layout under ``coco_path``. ``dataset_file='coco'``
    selects the dormant plain-COCO layout (``datasets/coco.py:151-161``:
    ``train2017/`` + ``annotations/instances_train2017.json``)."""
    data = cfg.data
    root = data.coco_path
    if getattr(data, "dataset_file", "") == "coco_panoptic":
        # ``datasets/__init__.py:31-34``: panoptic routes to its own
        # dataset (PNG id maps + segments_info; incompatible with the
        # detection loader's Sample contract, like the reference)
        from dfvod_tpu.data.panoptic import build_panoptic
        return build_panoptic(
            image_set, root,
            getattr(data, "coco_panoptic_path", "") or root,
            return_masks=getattr(cfg.model, "masks", False))
    if getattr(data, "dataset_file", "").startswith("coco"):
        paths = {
            "train": (os.path.join(root, "train2017"),
                      os.path.join(root, "annotations",
                                   "instances_train2017.json")),
            "val": (os.path.join(root, "val2017"),
                    os.path.join(root, "annotations",
                                 "instances_val2017.json")),
        }
    else:
        paths = {
            "train": (os.path.join(root, "coco", "images"),
                      os.path.join(root, "coco", "annotations",
                                   "train.json")),
            "val": (os.path.join(root, "coco", "images"),
                    os.path.join(root, "coco", "annotations", "val.json")),
        }
    img_folder, ann_file = paths[image_set]
    train = image_set == "train"
    cache_kw = {}
    if getattr(data, "cache_mode", False):
        # shard the in-RAM cache across hosts like the reference pairs
        # --cache_mode with NodeDistributedSampler (``main.py:249-251``)
        import jax
        cache_kw = dict(cache_mode=True, cache_rank=jax.process_index(),
                        cache_world=jax.process_count())
    return_masks = bool(getattr(cfg.model, "masks", False))
    if temporal:
        return CocoVideoDataset(
            img_folder, ann_file, num_ref_frames=data.num_ref_frames,
            use_depth=data.use_depth, train=train,
            return_masks=return_masks, **cache_kw)
    return CocoDetectionDataset(img_folder, ann_file,
                                use_depth=data.use_depth, train=train,
                                return_masks=return_masks, **cache_kw)


def make_transform(train: bool, cfg):
    data = cfg.data
    if train:
        return TrainTransform(short_sides=data.train_short_sides,
                              max_size=data.max_size,
                              strong_aug=data.strong_aug)
    return EvalTransform(short_side=data.eval_short_side,
                         max_size=data.max_size)
