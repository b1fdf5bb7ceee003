"""Instance-mask dataset path (``return_masks=True``): from-scratch COCO
RLE decode, polygon rasterization, keep-filter consistency, and
mask flow through transforms -> loader collation (reference:
``ConvertCocoPolysToMask`` with ``return_masks=args.masks``,
``datasets/coco.py:34-75``)."""
import json

import numpy as np
import pytest
from PIL import Image

from dfvod_tpu.data.dataset import (
    CocoDetectionDataset,
    _decode_rle_counts,
    prepare_targets,
    rasterize_segmentation,
)
from dfvod_tpu.data.loader import Loader
from dfvod_tpu.data.transforms import (
    Sample,
    TrainTransform,
    _hflip,
    _resize,
    normalize_and_pad,
)


class TestRLE:
    def test_decode_simple(self):
        # hand-encoded per the pycocotools codec spec: values < 16 with no
        # continuation are single chars biased by 48
        assert _decode_rle_counts("32") == [3, 2]

    def test_decode_delta_from_fourth(self):
        # pycocotools ``rleToString``: indices 0..2 raw, i>2 stores
        # cnts[i]-cnts[i-2]; [1,1,1,1] -> stored [1,1,1,0]
        assert _decode_rle_counts("111") == [1, 1, 1]
        assert _decode_rle_counts("1110") == [1, 1, 1, 1]

    def test_decode_negative_delta_sign_extension(self):
        # counts [2,5,3,1] stores [2,5,3,-4]; -4 encodes as the single
        # char chr(48 + (-4 & 0x1F)) = 'L' with bit4 sign-extended
        assert _decode_rle_counts("253L") == [2, 5, 3, 1]

    def test_decode_multichunk_continuation(self):
        # 100 = 0b_00011_00100 -> chunks [4|0x20, 3] -> chr(48+36)chr(48+3)
        assert _decode_rle_counts(chr(48 + 36) + chr(48 + 3)) == [100]

    def test_uncompressed_rle_column_major(self):
        seg = {"size": [2, 3], "counts": [1, 2, 3]}
        m = rasterize_segmentation(seg, 2, 3)
        # flat col-major [0,1,1,0,0,0] -> cols [(0,1),(1,0),(0,0)]
        assert m.tolist() == [[0, 1, 0], [1, 0, 0]]

    def test_compressed_matches_uncompressed(self):
        # counts [1,2,3] all stored raw (indices <= 2) -> "123"
        want = rasterize_segmentation({"size": [2, 3], "counts": [1, 2, 3]},
                                      2, 3)
        got = rasterize_segmentation({"size": [2, 3], "counts": "123"},
                                     2, 3)
        np.testing.assert_array_equal(got, want)


class TestPolygons:
    def test_square_polygon_filled(self):
        seg = [[10, 10, 20, 10, 20, 20, 10, 20]]
        m = rasterize_segmentation(seg, 32, 32)
        assert m.shape == (32, 32)
        assert m[15, 15] == 1          # interior
        assert m[5, 5] == 0            # outside
        assert m[25, 25] == 0
        area = int(m.sum())
        assert 100 <= area <= 121      # 10..11 px per side incl. boundary

    def test_multi_polygon_union(self):
        seg = [[2, 2, 8, 2, 8, 8, 2, 8], [20, 20, 26, 20, 26, 26, 20, 26]]
        m = rasterize_segmentation(seg, 32, 32)
        assert m[4, 4] == 1 and m[22, 22] == 1 and m[14, 14] == 0


class TestPrepareTargets:
    def test_keep_filter_drops_mask_with_box(self):
        anns = [
            {"bbox": [5, 5, 10, 10], "category_id": 1, "iscrowd": 0,
             "segmentation": [[5, 5, 15, 5, 15, 15, 5, 15]]},
            {"bbox": [40, 40, 0, 0], "category_id": 2, "iscrowd": 0,
             "segmentation": [[40, 40, 41, 40, 41, 41]]},  # degenerate box
        ]
        boxes, labels, masks = prepare_targets(anns, 64, 64,
                                               return_masks=True)
        assert len(boxes) == len(masks) == 1
        assert labels.tolist() == [1]
        assert masks[0, 10, 10] == 1

    def test_empty_anns(self):
        boxes, labels, masks = prepare_targets([], 16, 16, return_masks=True)
        assert masks.shape == (0, 16, 16)


class TestMaskTransforms:
    def _sample(self):
        h, w = 48, 64
        masks = np.zeros((1, h, w), np.uint8)
        masks[0, 8:20, 8:24] = 1
        return Sample(rgb=np.zeros((h, w, 3), np.uint8), depth=None,
                      boxes=np.array([[8, 8, 24, 20]], np.float32),
                      labels=np.array([1], np.int64), masks=masks,
                      orig_size=(h, w))

    def test_hflip_tracks_boxes(self):
        s = _hflip(self._sample())
        ys, xs = np.nonzero(s.masks[0])
        x0, x1 = xs.min(), xs.max() + 1
        assert (x0, x1) == (int(s.boxes[0, 0]), int(s.boxes[0, 2]))

    def test_resize_tracks_boxes_approximately(self):
        s = _resize(self._sample(), 96, 200)  # 2x upscale
        assert s.masks.shape == (1, 96, 128)
        ys, xs = np.nonzero(s.masks[0])
        # nearest-neighbour bbox within 2px of the scaled box
        assert abs(xs.min() - s.boxes[0, 0]) <= 2
        assert abs(xs.max() + 1 - s.boxes[0, 2]) <= 2
        assert abs(ys.min() - s.boxes[0, 1]) <= 2
        assert abs(ys.max() + 1 - s.boxes[0, 3]) <= 2

    def test_normalize_and_pad_emits_padded_masks(self):
        out = normalize_and_pad(self._sample(), (128, 128), False, 8)
        assert out["masks"].shape == (8, 128, 128)
        assert out["masks"][0, 10, 10] == 1
        assert out["masks"][0].sum() == 12 * 16
        assert out["masks"][1].sum() == 0  # padding slots empty

    def test_no_masks_no_key(self):
        s = self._sample()
        s.masks = None
        assert "masks" not in normalize_and_pad(s, (64, 64), False, 8)


@pytest.fixture
def seg_coco_dir(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(4):
        name = f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)
                        ).save(img_dir / name)
        images.append({"id": i + 1, "file_name": f"images/{name}",
                       "width": 64, "height": 48})
        annotations.append({"id": i + 1, "image_id": i + 1,
                            "category_id": 1, "bbox": [8, 8, 16, 12],
                            "area": 192, "iscrowd": 0,
                            "segmentation": [[8, 8, 24, 8, 24, 20, 8, 20]]})
    ann = tmp_path / "train.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "Hand"}]}))
    return tmp_path, str(ann)


class TestLoaderMasks:
    def test_batch_contains_masks(self, seg_coco_dir):
        root, ann = seg_coco_dir
        ds = CocoDetectionDataset(str(root), ann, train=True,
                                  return_masks=True)
        loader = Loader(ds, TrainTransform(short_sides=[48], max_size=64),
                        batch_size=2, max_boxes=4, shuffle=False,
                        prefetch=0)
        batch = loader.first_batch()
        assert "masks" in batch
        b, t = batch["masks"].shape[:2]
        assert (b, t) == (2, 4)
        assert batch["masks"].shape[2:] == batch["image"].shape[1:3]
        # instance 0 present, padding slots empty
        m = np.asarray(batch["masks"])
        assert m[0, 0].sum() > 0 and m[0, 1].sum() == 0

    def test_return_masks_off_keeps_contract(self, seg_coco_dir):
        root, ann = seg_coco_dir
        ds = CocoDetectionDataset(str(root), ann, train=True)
        sample = ds[0][0]
        assert sample.masks is None
