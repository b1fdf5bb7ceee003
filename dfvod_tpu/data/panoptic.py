"""COCO-panoptic dataset + PQ evaluation (no panopticapi dependency).

TPU-side equivalents of the reference's dormant panoptic stack:
``datasets/coco_panoptic.py`` (CocoPanoptic dataset: per-image PNG id
maps + segments_info) and ``datasets/panoptic_eval.py`` (PanopticEvaluator
delegating to panopticapi's ``pq_compute``). Both are reimplemented
from scratch: the dataset parses the panoptic JSON/PNGs into numpy
targets, and ``pq_compute`` reproduces panopticapi's matching semantics
(IoU>0.5 unique matching, VOID handling, crowd-GT exclusion with the
half-area FP waiver).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

VOID = 0
_OFFSET = 256 ** 3


def rgb2id(color: np.ndarray) -> np.ndarray:
    """panopticapi id encoding: R + 256 G + 256^2 B."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    """Inverse of ``rgb2id`` -> (H, W, 3) uint8."""
    id_map = id_map.astype(np.uint32)
    return np.stack([id_map % 256, (id_map // 256) % 256,
                     (id_map // (256 * 256)) % 256], -1).astype(np.uint8)


def masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """``util/box_ops.py:masks_to_boxes``: (N, H, W) -> (N, 4) xyxy."""
    if masks.size == 0:
        return np.zeros((0, 4), np.float32)
    n, h, w = masks.shape
    boxes = np.zeros((n, 4), np.float32)
    ys, xs = np.arange(h), np.arange(w)
    for i, m in enumerate(masks):
        if not m.any():
            continue
        xi = xs[m.any(axis=0)]
        yi = ys[m.any(axis=1)]
        boxes[i] = [xi[0], yi[0], xi[-1] + 1, yi[-1] + 1]
    return boxes


class CocoPanopticDataset:
    """``datasets/coco_panoptic.py:23-86`` equivalent.

    ``__getitem__`` -> (rgb (H, W, 3) uint8, target dict with masks
    (N, H, W) bool, labels (N,), boxes xyxy, iscrowd, area, image_id).
    Dormant in the reference thesis; provided for
    ``--dataset_file coco_panoptic`` parity.
    """

    def __init__(self, img_folder: str, ann_folder: str, ann_file: str,
                 return_masks: bool = True):
        from PIL import Image  # noqa: F401 (import check at init)
        with open(ann_file) as f:
            self.coco = json.load(f)
        self.coco["images"] = sorted(self.coco["images"],
                                     key=lambda x: x["id"])
        if "annotations" in self.coco:
            for img, ann in zip(self.coco["images"],
                                self.coco["annotations"]):
                assert img["file_name"][:-4] == ann["file_name"][:-4]
        self.img_folder = img_folder
        self.ann_folder = ann_folder
        self.return_masks = return_masks

    def __len__(self):
        return len(self.coco["images"])

    def __getitem__(self, idx: int):
        from PIL import Image
        anns = self.coco.get("annotations")
        info = anns[idx] if anns else self.coco["images"][idx]
        img_path = os.path.join(
            self.img_folder, info["file_name"].replace(".png", ".jpg"))
        rgb = np.asarray(Image.open(img_path).convert("RGB"))
        target: Dict = {"image_id": info.get("image_id", info.get("id"))}
        if "segments_info" in info:
            pan = np.asarray(Image.open(
                os.path.join(self.ann_folder, info["file_name"])))
            id_map = rgb2id(pan)
            ids = np.array([s["id"] for s in info["segments_info"]])
            masks = id_map[None] == ids[:, None, None]
            if self.return_masks:
                target["masks"] = masks
            target["labels"] = np.array(
                [s["category_id"] for s in info["segments_info"]],
                np.int64)
            target["boxes"] = masks_to_boxes(masks)
            target["iscrowd"] = np.array(
                [s.get("iscrowd", 0) for s in info["segments_info"]])
            target["area"] = np.array(
                [s["area"] for s in info["segments_info"]])
        target["orig_size"] = rgb.shape[:2]
        return rgb, target


def build_panoptic(image_set: str, coco_path: str,
                   coco_panoptic_path: str, return_masks: bool = True):
    """``coco_panoptic.py:89-107``: the hard-coded panoptic layout."""
    mode = "panoptic"
    split = {"train": "train2017", "val": "val2017"}[image_set]
    return CocoPanopticDataset(
        os.path.join(coco_path, split),
        os.path.join(coco_panoptic_path, f"{mode}_{split}"),
        os.path.join(coco_panoptic_path, "annotations",
                     f"{mode}_{split}.json"),
        return_masks=return_masks)


def _segment_areas(id_map: np.ndarray) -> Dict[int, int]:
    ids, counts = np.unique(id_map, return_counts=True)
    return {int(i): int(c) for i, c in zip(ids, counts)}


def pq_compute_single(gt_map: np.ndarray, gt_segments: Sequence[Dict],
                      pred_map: np.ndarray,
                      pred_segments: Sequence[Dict], stats: Dict):
    """One image's PQ accumulation — panopticapi
    ``pq_compute_single_core`` semantics:

    - intersections via the joint (gt * OFFSET + pred) histogram
    - IoU denominator excludes the pred's overlap with gt VOID
    - a (gt, pred) pair matches iff same category and IoU > 0.5
    - crowd GT segments never match; unmatched preds are waived (not FP)
      when more than half their area lies on VOID + same-category crowd
    """
    gt_info = {int(s["id"]): s for s in gt_segments}
    pred_info = {int(s["id"]): s for s in pred_segments}
    gt_areas = _segment_areas(gt_map)
    pred_areas = _segment_areas(pred_map)

    combined = gt_map.astype(np.uint64) * _OFFSET + pred_map.astype(
        np.uint64)
    pairs, counts = np.unique(combined, return_counts=True)
    inter = {(int(p // _OFFSET), int(p % _OFFSET)): int(c)
             for p, c in zip(pairs, counts)}

    def cat(info, sid):
        return int(info[sid]["category_id"])

    matched_gt, matched_pred = set(), set()
    for (g, p), c in inter.items():
        if g == VOID or p == VOID or g not in gt_info or \
                p not in pred_info:
            continue
        if gt_info[g].get("iscrowd", 0):
            continue
        if cat(gt_info, g) != cat(pred_info, p):
            continue
        union = (gt_areas.get(g, 0) + pred_areas.get(p, 0) - c
                 - inter.get((VOID, p), 0))
        iou = c / union if union > 0 else 0.0
        if iou > 0.5:
            k = cat(gt_info, g)
            st = stats.setdefault(k, {"tp": 0, "fp": 0, "fn": 0,
                                      "iou": 0.0})
            st["tp"] += 1
            st["iou"] += iou
            matched_gt.add(g)
            matched_pred.add(p)

    crowd_by_cat: Dict[int, int] = {}
    for g, info in gt_info.items():
        if info.get("iscrowd", 0):
            crowd_by_cat[cat(gt_info, g)] = g
            continue
        if g not in matched_gt:
            st = stats.setdefault(cat(gt_info, g),
                                  {"tp": 0, "fp": 0, "fn": 0, "iou": 0.0})
            st["fn"] += 1

    for p, info in pred_info.items():
        if p in matched_pred or p not in pred_areas:
            continue
        ignore = inter.get((VOID, p), 0)
        crowd_id = crowd_by_cat.get(cat(pred_info, p))
        if crowd_id is not None:
            ignore += inter.get((crowd_id, p), 0)
        if ignore / pred_areas[p] > 0.5:
            continue
        st = stats.setdefault(cat(pred_info, p),
                              {"tp": 0, "fp": 0, "fn": 0, "iou": 0.0})
        st["fp"] += 1


def pq_average(stats: Dict, categories: Optional[Dict[int, bool]] = None,
               isthing: Optional[bool] = None) -> Dict:
    """Average PQ/SQ/RQ over categories (panopticapi ``pq_average``)."""
    n, pq, sq, rq = 0, 0.0, 0.0, 0.0
    for k, st in stats.items():
        if isthing is not None:
            if categories is None or categories.get(k) != isthing:
                continue
        denom = st["tp"] + 0.5 * st["fp"] + 0.5 * st["fn"]
        if denom == 0:
            continue
        n += 1
        pq_c = st["iou"] / denom
        sq_c = st["iou"] / st["tp"] if st["tp"] else 0.0
        rq_c = st["tp"] / denom
        pq += pq_c
        sq += sq_c
        rq += rq_c
    if n == 0:
        return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
    return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}


class PanopticEvaluator:
    """``datasets/panoptic_eval.py:21-52`` equivalent.

    ``update`` takes ``postprocess_panoptic`` outputs
    ((seg_map, segments_info) per image) paired with ground truth;
    ``summarize`` returns {"All": ..., "Things": ..., "Stuff": ...}.
    Optionally writes id2rgb PNG artifacts like the reference.
    """

    def __init__(self, is_thing_map: Optional[Dict[int, bool]] = None,
                 output_dir: str = ""):
        self.stats: Dict = {}
        self.is_thing_map = is_thing_map or {}
        self.output_dir = output_dir
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)

    def update(self, pred_map, pred_segments, gt_map, gt_segments,
               file_name: str = ""):
        pq_compute_single(np.asarray(gt_map), gt_segments,
                          np.asarray(pred_map), pred_segments, self.stats)
        if self.output_dir and file_name:
            from PIL import Image
            Image.fromarray(id2rgb(np.asarray(pred_map))).save(
                os.path.join(self.output_dir, file_name))

    def synchronize_between_processes(self):
        """Cross-host merge of the per-category stats (the reference
        all_gathers prediction lists, ``panoptic_eval.py:38-43``; the
        counters are sufficient). Length-agreed byte allgather like
        ``coco_eval.CocoEvaluator``."""
        import jax
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        payload = json.dumps(self.stats).encode()
        n = int(np.max(np.asarray(multihost_utils.process_allgather(
            np.asarray([len(payload)], np.int64)))))
        buf = np.zeros((n,), np.uint8)
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        gathered = multihost_utils.process_allgather(buf)
        merged: Dict = {}
        for row in np.asarray(gathered).reshape(-1, n):
            part = json.loads(bytes(row).rstrip(b"\x00").decode())
            for k, st in part.items():
                m = merged.setdefault(int(k), {"tp": 0, "fp": 0, "fn": 0,
                                               "iou": 0.0})
                for f in ("tp", "fp", "fn", "iou"):
                    m[f] += st[f]
        self.stats = merged

    def summarize(self) -> Dict:
        out = {"All": pq_average(self.stats)}
        if self.is_thing_map:
            out["Things"] = pq_average(self.stats, self.is_thing_map,
                                       isthing=True)
            out["Stuff"] = pq_average(self.stats, self.is_thing_map,
                                      isthing=False)
        return out
