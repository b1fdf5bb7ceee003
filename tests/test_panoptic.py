"""Panoptic dataset + PQ evaluation tests (``datasets/coco_panoptic.py``
and ``datasets/panoptic_eval.py`` parity — panopticapi matching
semantics reproduced from scratch)."""
import json

import numpy as np
import pytest
from PIL import Image

from dfvod_tpu.data.panoptic import (
    CocoPanopticDataset,
    PanopticEvaluator,
    id2rgb,
    masks_to_boxes,
    pq_average,
    pq_compute_single,
    rgb2id,
)


class TestIdCodec:
    def test_roundtrip(self):
        ids = np.array([[0, 1, 255], [256, 70000, 256 ** 3 - 1]],
                       np.uint32)
        np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


class TestMasksToBoxes:
    def test_boxes(self):
        m = np.zeros((2, 8, 10), bool)
        m[0, 2:5, 3:7] = True
        m[1, 0:1, 9:10] = True
        b = masks_to_boxes(m)
        np.testing.assert_array_equal(b[0], [3, 2, 7, 5])
        np.testing.assert_array_equal(b[1], [9, 0, 10, 1])

    def test_empty(self):
        assert masks_to_boxes(np.zeros((0, 4, 4), bool)).shape == (0, 4)


def _seg(i, cat, crowd=0):
    return {"id": i, "category_id": cat, "iscrowd": crowd}


class TestPQ:
    def test_perfect_match(self):
        gt = np.zeros((10, 10), np.int32)
        gt[:5] = 1
        gt[5:] = 2
        stats = {}
        pq_compute_single(gt, [_seg(1, 7), _seg(2, 8)],
                          gt.copy(), [_seg(1, 7), _seg(2, 8)], stats)
        res = pq_average(stats)
        assert res["pq"] == pytest.approx(1.0)
        assert res["n"] == 2

    def test_category_mismatch_is_fp_and_fn(self):
        gt = np.ones((6, 6), np.int32)
        stats = {}
        pq_compute_single(gt, [_seg(1, 7)], gt.copy(), [_seg(1, 8)],
                          stats)
        assert stats[7]["fn"] == 1 and stats[8]["fp"] == 1
        assert pq_average(stats)["pq"] == 0.0

    def test_iou_gate_at_half(self):
        gt = np.zeros((10, 10), np.int32)
        gt[:, :6] = 1                      # gt area 60
        pred = np.zeros((10, 10), np.int32)
        pred[:, :3] = 1                    # inter 30, union 60: iou 0.5 -> no
        stats = {}
        pq_compute_single(gt, [_seg(1, 7)], pred, [_seg(1, 7)], stats)
        assert stats[7]["tp"] == 0 and stats[7]["fn"] == 1
        # grow the prediction: iou > 0.5 -> TP with that iou
        pred[:, :5] = 1                    # inter 50, union 60
        stats = {}
        pq_compute_single(gt, [_seg(1, 7)], pred, [_seg(1, 7)], stats)
        assert stats[7]["tp"] == 1
        assert stats[7]["iou"] == pytest.approx(50 / 60)

    def test_void_excluded_from_union(self):
        """Pred overlapping gt VOID: that area leaves the IoU denominator
        (panopticapi's union -= VOID∩pred)."""
        gt = np.zeros((10, 10), np.int32)
        gt[:, :5] = 1                      # right half VOID
        pred = np.ones((10, 10), np.int32) # covers everything
        stats = {}
        pq_compute_single(gt, [_seg(1, 7)], pred, [_seg(1, 7)], stats)
        # inter 50, union = 50 + 100 - 50 - 50(void∩pred) = 50 -> iou 1
        assert stats[7]["tp"] == 1
        assert stats[7]["iou"] == pytest.approx(1.0)

    def test_crowd_gt_never_matches_but_waives_fp(self):
        gt = np.ones((10, 10), np.int32)   # all crowd of cat 7
        pred = np.ones((10, 10), np.int32)
        stats = {}
        pq_compute_single(gt, [_seg(1, 7, crowd=1)], pred, [_seg(1, 7)],
                          stats)
        # no TP (crowd skipped), no FN (crowd not counted), and the pred
        # is waived (>=half its area on same-category crowd) -> no FP
        assert stats.get(7, {"tp": 0})["tp"] == 0
        assert stats.get(7, {"fn": 0})["fn"] == 0
        assert stats.get(7, {"fp": 0})["fp"] == 0

    def test_unmatched_pred_on_void_waived(self):
        gt = np.zeros((10, 10), np.int32)  # all VOID
        pred = np.ones((10, 10), np.int32)
        stats = {}
        pq_compute_single(gt, [], pred, [_seg(1, 7)], stats)
        assert stats == {}

    def test_things_stuff_split(self):
        gt = np.zeros((10, 10), np.int32)
        gt[:5] = 1
        gt[5:] = 2
        stats = {}
        pq_compute_single(gt, [_seg(1, 7), _seg(2, 8)],
                          gt.copy(), [_seg(1, 7), _seg(2, 8)], stats)
        ev = PanopticEvaluator(is_thing_map={7: True, 8: False})
        ev.stats = stats
        out = ev.summarize()
        assert out["Things"]["n"] == 1 and out["Stuff"]["n"] == 1
        assert out["All"]["pq"] == pytest.approx(1.0)


class TestDataset:
    @pytest.fixture
    def pan_tree(self, tmp_path):
        img_dir = tmp_path / "val2017"
        ann_dir = tmp_path / "pan" / "panoptic_val2017"
        img_dir.mkdir()
        ann_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        images, annotations = [], []
        for i in (1, 2):
            name = f"img_{i}"
            Image.fromarray(rng.integers(0, 255, (16, 20, 3), np.uint8)
                            ).save(img_dir / f"{name}.jpg")
            id_map = np.zeros((16, 20), np.uint32)
            id_map[2:8, 3:9] = 5
            id_map[10:14, 10:18] = 9
            Image.fromarray(id2rgb(id_map)).save(ann_dir / f"{name}.png")
            images.append({"id": i, "file_name": f"{name}.png",
                           "height": 16, "width": 20})
            annotations.append({
                "image_id": i, "file_name": f"{name}.png",
                "segments_info": [
                    {"id": 5, "category_id": 1, "iscrowd": 0, "area": 36},
                    {"id": 9, "category_id": 2, "iscrowd": 0, "area": 32},
                ]})
        ann_file = tmp_path / "pan" / "panoptic_val2017.json"
        ann_file.write_text(json.dumps(
            {"images": images, "annotations": annotations}))
        return img_dir, ann_dir, ann_file

    def test_getitem(self, pan_tree):
        img_dir, ann_dir, ann_file = pan_tree
        ds = CocoPanopticDataset(str(img_dir), str(ann_dir),
                                 str(ann_file))
        assert len(ds) == 2
        rgb, tgt = ds[0]
        assert rgb.shape == (16, 20, 3)
        assert tgt["masks"].shape == (2, 16, 20)
        assert tgt["masks"][0].sum() == 36
        np.testing.assert_array_equal(tgt["labels"], [1, 2])
        np.testing.assert_array_equal(tgt["boxes"][0], [3, 2, 9, 8])
        assert tgt["image_id"] == 1

    def test_evaluator_end_to_end(self, pan_tree, tmp_path):
        """GT vs itself through the evaluator: PQ == 1, artifact PNG
        written like the reference."""
        img_dir, ann_dir, ann_file = pan_tree
        ds = CocoPanopticDataset(str(img_dir), str(ann_dir),
                                 str(ann_file))
        ev = PanopticEvaluator(is_thing_map={1: True, 2: False},
                               output_dir=str(tmp_path / "out"))
        for i in range(len(ds)):
            _, tgt = ds[i]
            id_map = np.zeros(tgt["masks"].shape[1:], np.int32)
            segs = []
            for j, (m, lab) in enumerate(zip(tgt["masks"],
                                             tgt["labels"]), start=1):
                id_map[m] = j
                segs.append({"id": j, "category_id": int(lab)})
            ev.update(id_map, segs, id_map, segs,
                      file_name=f"img_{i}.png")
        ev.synchronize_between_processes()
        out = ev.summarize()
        assert out["All"]["pq"] == pytest.approx(1.0)
        assert (tmp_path / "out" / "img_0.png").exists()
