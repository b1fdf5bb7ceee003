"""COCO bbox mAP evaluator tests — hand-constructed cases with known
pycocotools outcomes."""
import numpy as np

from dfvod_tpu.data.coco import COCO
from dfvod_tpu.data.coco_eval import COCOEvaluator, bbox_iou_xywh


def make_gt(boxes_per_img, cat_id=1):
    images, anns = [], []
    ann_id = 1
    for img_id, boxes in boxes_per_img.items():
        images.append({"id": img_id, "width": 100, "height": 100,
                       "file_name": f"{img_id}.jpg"})
        for b in boxes:
            crowd = len(b) == 5 and b[4]
            anns.append({"id": ann_id, "image_id": img_id,
                         "category_id": cat_id, "bbox": list(b[:4]),
                         "area": b[2] * b[3], "iscrowd": int(crowd)})
            ann_id += 1
    return COCO(dataset={"images": images, "annotations": anns,
                         "categories": [{"id": cat_id, "name": "hand"}]})


def preds(dets):
    """dets: {img_id: [(x1,y1,x2,y2,score), ...]}"""
    return {i: {"boxes": np.array([d[:4] for d in ds], np.float64
                                  ).reshape(-1, 4),
                "scores": np.array([d[4] for d in ds], np.float64),
                "labels": np.ones(len(ds), int)}
            for i, ds in dets.items()}


class TestIoU:
    def test_basic(self):
        d = np.array([[0, 0, 10, 10]], np.float64)
        g = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], np.float64)
        iou = bbox_iou_xywh(d, g, np.zeros(2))
        np.testing.assert_allclose(iou[0, 0], 1.0)
        np.testing.assert_allclose(iou[0, 1], 25 / 175)

    def test_crowd_union_is_det_area(self):
        d = np.array([[0, 0, 10, 10]], np.float64)
        g = np.array([[0, 0, 20, 20]], np.float64)
        iou = bbox_iou_xywh(d, g, np.ones(1))
        np.testing.assert_allclose(iou[0, 0], 1.0)  # det fully inside crowd


class TestEvaluator:
    def test_perfect_predictions(self):
        gt = make_gt({1: [(10, 10, 20, 20)], 2: [(30, 30, 10, 10)]})
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(10, 10, 30, 30, 0.9)],
                         2: [(30, 30, 40, 40, 0.8)]}))
        stats = ev.summarize(verbose=False)
        assert stats["mAP"] == 1.0
        assert stats["mAP_50"] == 1.0

    def test_miss_is_zero(self):
        gt = make_gt({1: [(10, 10, 20, 20)]})
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(70, 70, 90, 90, 0.9)]}))
        stats = ev.summarize(verbose=False)
        assert stats["mAP"] == 0.0

    def test_iou_threshold_cut(self):
        # det overlaps gt with IoU ~0.58: TP at 0.5, FP at 0.75
        gt = make_gt({1: [(0, 0, 10, 10)]})
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(0, 0, 10, 7, 0.9)]}))
        stats = ev.summarize(verbose=False)
        assert stats["mAP_50"] == 1.0
        assert stats["mAP_75"] == 0.0

    def test_duplicate_detection_is_fp(self):
        gt = make_gt({1: [(0, 0, 10, 10)]})
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(0, 0, 10, 10, 0.9), (0, 0, 10, 10, 0.8)]}))
        stats = ev.summarize(verbose=False)
        # AP@0.5: recall 1 at precision 1 from first det; dup halves
        # precision beyond -> interpolated AP stays 1.0 at all recalls
        assert stats["mAP_50"] == 1.0

    def test_crowd_matches_dont_count(self):
        gt = make_gt({1: [(0, 0, 50, 50, True), (60, 60, 10, 10)]})
        ev = COCOEvaluator(gt)
        # one det inside the crowd (ignored), one on the real gt
        ev.update(preds({1: [(5, 5, 15, 15, 0.9),
                             (60, 60, 70, 70, 0.8)]}))
        stats = ev.summarize(verbose=False)
        assert stats["mAP_50"] == 1.0

    def test_score_ordering_matters(self):
        # wrong box has higher score -> precision at recall 1 is 0.5
        gt = make_gt({1: [(0, 0, 10, 10)]})
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(50, 50, 60, 60, 0.95), (0, 0, 10, 10, 0.5)]}))
        stats = ev.summarize(verbose=False)
        assert abs(stats["mAP_50"] - 0.5) < 0.01

    def test_area_ranges(self):
        gt = make_gt({1: [(0, 0, 10, 10)]})  # area 100 -> small
        ev = COCOEvaluator(gt)
        ev.update(preds({1: [(0, 0, 10, 10, 0.9)]}))
        stats = ev.summarize(verbose=False)
        assert stats["mAP_small"] == 1.0
        assert stats["mAP_large"] == -1.0  # no large gts
