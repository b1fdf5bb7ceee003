"""Independent-oracle fuzz test for the from-scratch COCO evaluator.

pycocotools cannot be installed in this image, so the cross-check the
round-1 verdict asked for ("evaluator cross-checked once against
pycocotools... or a vendored minimal COCOeval in tests") is done with a
*structurally different* re-implementation written from the published
COCOeval definition (greedy per-threshold matching in score order +
101-point interpolated AP, ``pycocotools/cocoeval.py`` semantics): a
naive per-image dict/loop oracle with none of the production evaluator's
vectorization (no cumsum matrices, no precision-envelope in-place pass,
no searchsorted). Agreement on random scenes over crowd/ignore-free
inputs pins the production evaluator's matching, interpolation, and
aggregation; dedicated crowd/ignore cases live in ``test_coco_eval.py``.
"""
from __future__ import annotations

import numpy as np
import pytest

from dfvod_tpu.data.coco_eval import COCOEvaluator, IOU_THRS, REC_THRS


class _FakeCOCO:
    """Minimal coco-gt shim carrying imgToAnns/cats for the evaluator."""

    def __init__(self, anns_by_img, cat_ids):
        self.imgToAnns = anns_by_img
        self.cats = {c: {"id": c} for c in cat_ids}

    def getCatIds(self):
        return sorted(self.cats)

    def getImgIds(self):
        return sorted(self.imgToAnns)


def _iou_xyxy(d, g):
    ix = max(0.0, min(d[2], g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[3], g[3]) - max(d[1], g[1]))
    inter = ix * iy
    ua = ((d[2] - d[0]) * (d[3] - d[1]) +
          (g[2] - g[0]) * (g[3] - g[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def _oracle_ap(dets, gts, img_ids, cat_ids):
    """AP per the COCO definition, one threshold at a time, pure loops.

    dets: list of (img, cat, box_xyxy, score); gts: list of (img, cat,
    box_xyxy). Returns (mAP, AP50) averaged over categories with >=1 gt.
    """
    per_thr_ap = np.zeros((len(IOU_THRS), len(cat_ids)))
    has_gt = np.zeros(len(cat_ids), dtype=bool)
    for k, cat in enumerate(cat_ids):
        cat_gts = {i: [g[2] for g in gts if g[0] == i and g[1] == cat]
                   for i in img_ids}
        n_pos = sum(len(v) for v in cat_gts.values())
        if n_pos == 0:
            continue
        has_gt[k] = True
        cat_dets = sorted([d for d in dets if d[1] == cat],
                          key=lambda d: -d[3])
        for t, thr in enumerate(IOU_THRS):
            matched = {i: [False] * len(cat_gts[i]) for i in img_ids}
            tp_flags = []
            for img, _, box, _ in cat_dets:
                best_iou, best_g = thr, -1
                for gi, gbox in enumerate(cat_gts[img]):
                    if matched[img][gi]:
                        continue
                    iou = _iou_xyxy(box, gbox)
                    # >= at the threshold, then strictly better after a
                    # first match (pycocotools: iou < best skips)
                    if (iou > best_iou or
                            (best_g == -1 and iou >= best_iou)):
                        best_iou, best_g = iou, gi
                if best_g >= 0:
                    matched[img][best_g] = True
                    tp_flags.append(True)
                else:
                    tp_flags.append(False)
            tp = np.cumsum(tp_flags, dtype=np.float64)
            fp = np.cumsum([not f for f in tp_flags], dtype=np.float64)
            rec = tp / n_pos
            prec = tp / np.maximum(tp + fp, 1e-12)
            # AP = mean over the 101 recall points of the max precision
            # at recall >= r (interpolated precision by definition)
            ap = 0.0
            for r in REC_THRS:
                ok = rec >= r
                ap += float(prec[ok].max()) if ok.any() else 0.0
            per_thr_ap[t, k] = ap / len(REC_THRS)
    if not has_gt.any():
        return -1.0, -1.0
    return (float(per_thr_ap[:, has_gt].mean()),
            float(per_thr_ap[0, has_gt].mean()))


def _random_scene(rng, n_imgs=4, n_cats=2):
    img_ids = list(range(1, n_imgs + 1))
    cat_ids = list(range(1, n_cats + 1))
    gts, dets = [], []
    ann_id = 1
    anns_by_img = {i: [] for i in img_ids}
    for img in img_ids:
        for _ in range(rng.integers(0, 5)):
            cat = int(rng.choice(cat_ids))
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(8, 120, 2)
            gts.append((img, cat, (x, y, x + w, y + h)))
            anns_by_img[img].append(
                {"id": ann_id, "image_id": img, "category_id": cat,
                 "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
            ann_id += 1
        # detections: jittered copies of gts + pure noise
        for img2, cat, (x0, y0, x1, y1) in gts:
            if img2 != img or rng.uniform() < 0.3:
                continue
            j = rng.uniform(-15, 15, 4)
            dets.append((img, cat,
                         (x0 + j[0], y0 + j[1],
                          max(x0 + j[0] + 4, x1 + j[2]),
                          max(y0 + j[1] + 4, y1 + j[3])),
                         float(rng.uniform(0.1, 1.0))))
        for _ in range(rng.integers(0, 4)):
            cat = int(rng.choice(cat_ids))
            x, y = rng.uniform(0, 220, 2)
            w, h = rng.uniform(8, 100, 2)
            dets.append((img, cat, (x, y, x + w, y + h),
                         float(rng.uniform(0.05, 1.0))))
    return img_ids, cat_ids, anns_by_img, gts, dets


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_matches_independent_oracle(seed):
    rng = np.random.default_rng(seed)
    img_ids, cat_ids, anns_by_img, gts, dets = _random_scene(rng)
    if not gts:
        pytest.skip("empty scene")
    ev = COCOEvaluator(_FakeCOCO(anns_by_img, cat_ids), img_ids=img_ids)
    preds = {}
    for img in img_ids:
        mine = [d for d in dets if d[0] == img]
        preds[img] = {
            "boxes": np.array([d[2] for d in mine]).reshape(-1, 4),
            "scores": np.array([d[3] for d in mine]),
            "labels": np.array([d[1] for d in mine], dtype=np.int64),
        }
    ev.update(preds)
    stats = ev.summarize(verbose=False)
    m_ap, ap50 = _oracle_ap(dets, gts, img_ids, cat_ids)
    # scenes keep every box inside the "all" area range and crowd-free,
    # so the two definitions must agree to float precision
    assert stats["mAP"] == pytest.approx(m_ap, abs=1e-9), seed
    assert stats["mAP_50"] == pytest.approx(ap50, abs=1e-9), seed
