"""Data pipeline tests — COCO parsing, paired RGB-D loading, transforms,
video ref-frame sampling, loader collation."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from dfvod_tpu.data.coco import COCO, CocoVID
from dfvod_tpu.data.dataset import (
    CocoDetectionDataset,
    CocoVideoDataset,
    prepare_targets,
)
from dfvod_tpu.data.loader import Loader, shard_indices
from dfvod_tpu.data.transforms import (
    EvalTransform,
    Sample,
    TrainTransform,
    _hflip,
    bucket_shape,
    normalize_and_pad,
    resize_short_side,
)


# (the shared ``coco_dir`` fixture lives in conftest.py)


class TestCoco:
    def test_index(self, coco_dir):
        _, ann = coco_dir
        coco = COCO(ann)
        assert len(coco.getImgIds()) == 8
        assert coco.getCatIds() == [1]
        assert len(coco.getAnnIds(imgIds=[1])) == 1

    def test_cocovid(self, coco_dir):
        _, ann = coco_dir
        vid = CocoVID(ann)
        assert vid.get_vid_ids() == [1, 2]
        assert vid.get_img_ids_from_vid(1) == [1, 2, 3, 4]


class TestTransforms:
    def test_resize_short_side_caps_long(self):
        assert resize_short_side(480, 640, 800, 1333) == (800, 1066)
        # long side would exceed max -> shrink
        h, w = resize_short_side(400, 1400, 800, 1333)
        assert w == 1333 and abs(h - 400 * 1333 / 1400) <= 1

    def test_hflip_boxes(self):
        s = Sample(rgb=np.zeros((10, 20, 3), np.uint8), depth=None,
                   boxes=np.array([[2., 1., 6., 5.]], np.float32),
                   labels=np.array([1]))
        f = _hflip(s)
        np.testing.assert_allclose(f.boxes, [[14., 1., 18., 5.]])

    def test_normalize_and_pad(self):
        rgb = np.full((40, 60, 3), 128, np.uint8)
        depth = np.full((40, 60), 255, np.uint8)
        s = Sample(rgb=rgb, depth=depth,
                   boxes=np.array([[10., 10., 30., 30.]], np.float32),
                   labels=np.array([1]), orig_size=(40, 60))
        out = normalize_and_pad(s, (64, 64), True, max_boxes=4)
        assert out["image"].shape == (64, 64, 4)
        assert not out["mask"][:40, :60].any()
        assert out["mask"][40:].all() and out["mask"][:, 60:].all()
        # depth channel normalized with DFormer stats
        np.testing.assert_allclose(out["image"][0, 0, 3],
                                   (1.0 - 0.48) / 0.28, rtol=1e-5)
        # box -> normalized cxcywh w.r.t. unpadded size
        np.testing.assert_allclose(out["boxes"][0],
                                   [20 / 60, 20 / 40, 20 / 60, 20 / 40],
                                   rtol=1e-5)
        assert out["valid"].tolist() == [True, False, False, False]

    def test_clip_shares_random_draw(self):
        rng = np.random.default_rng(3)
        frames = [Sample(rgb=np.zeros((48, 64, 3), np.uint8), depth=None,
                         boxes=np.zeros((0, 4), np.float32),
                         labels=np.zeros((0,), np.int64))
                  for _ in range(3)]
        tr = TrainTransform(short_sides=(480, 512, 544))
        for _ in range(5):
            out = tr(frames, rng)
            shapes = {f.rgb.shape for f in out}
            assert len(shapes) == 1  # same resize for all clip frames

    def test_bucket_shape(self):
        assert bucket_shape(600, 1066, 128, 1344) == (640, 1152)
        assert bucket_shape(1333, 400, 128, 1344) == (1344, 512)


class TestDataset:
    def test_prepare_targets_filters_degenerate(self):
        anns = [{"bbox": [5, 5, 10, 10], "category_id": 1, "iscrowd": 0},
                {"bbox": [5, 5, 0, 10], "category_id": 1, "iscrowd": 0},
                {"bbox": [5, 5, 10, 10], "category_id": 1, "iscrowd": 1}]
        boxes, labels = prepare_targets(anns, 100, 100)
        assert len(boxes) == 1
        np.testing.assert_allclose(boxes[0], [5, 5, 15, 15])

    def test_single_frame_rgbd(self, coco_dir):
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)
        clip = ds[0]
        assert len(clip) == 1
        s = clip[0]
        assert s.rgb.shape == (48, 64, 3)
        assert s.depth.shape == (48, 64)
        assert len(s.boxes) == 1

    def test_video_ref_sampling_train(self, coco_dir):
        root, ann = coco_dir
        ds = CocoVideoDataset(str(root), ann, num_ref_frames=2, train=True)
        # key id 2 (video 1: ids 1-4): window [1,3] minus key -> [1, 3]
        refs = ds._ref_ids(2)
        assert refs == [1, 3]
        clip = ds[1]
        assert len(clip) == 3  # key + 2 refs

    def test_video_ref_sampling_eval_strided(self, coco_dir):
        root, ann = coco_dir
        ds = CocoVideoDataset(str(root), ann, num_ref_frames=2, train=False)
        refs = ds._ref_ids(1)  # left edge -> forward sampling
        assert refs == [2, 3]
        refs = ds._ref_ids(4)  # right edge -> backward sampling
        assert refs == [3, 2]


class TestLoader:
    def test_shard_indices_contiguous(self):
        a = shard_indices(10, 0, 2, shuffle=False, seed=0, epoch=0)
        b = shard_indices(10, 1, 2, shuffle=False, seed=0, epoch=0)
        assert len(a) == len(b) == 5
        assert set(a.tolist()) | set(b.tolist()) == set(range(10))

    def test_batches_are_static_and_wrap(self, coco_dir):
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)
        loader = Loader(ds, EvalTransform(short_side=48, max_size=64),
                        batch_size=3, max_boxes=4, use_depth=True,
                        shuffle=False, bucket_step=32, pad_cap=64)
        batches = list(loader)
        assert len(batches) == 3  # ceil(8/3), last one wrapped
        for b in batches:
            assert b["image"].shape == batches[0]["image"].shape
            assert b["image"].shape[0] == 3
            assert b["boxes"].shape == (3, 4, 4)


    def test_bucket_ladder_env(self, coco_dir, monkeypatch):
        """DFVOD_BUCKET_LADDER snaps padded dims up to ladder rungs
        (program-count collapse for the tunnel's per-program cost); pad
        is masked so only the canvas shape changes."""
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)
        monkeypatch.setenv("DFVOD_BUCKET_LADDER", "48,64")
        loader = Loader(ds, EvalTransform(short_side=40, max_size=60),
                        batch_size=3, max_boxes=4, use_depth=True,
                        shuffle=False, bucket_step=32, pad_cap=96)
        shapes = {b["image"].shape[1:3] for b in loader}
        for h, w in shapes:
            assert h in (48, 64) and w in (48, 64), shapes
        # ladder off -> 32-multiples (the old bucket_shape behavior)
        monkeypatch.delenv("DFVOD_BUCKET_LADDER")
        loader2 = Loader(ds, EvalTransform(short_side=40, max_size=60),
                        batch_size=3, max_boxes=4, use_depth=True,
                        shuffle=False, bucket_step=32, pad_cap=96)
        for b in loader2:
            h, w = b["image"].shape[1:3]
            assert h % 32 == 0 and w % 32 == 0

    def test_num_workers_batches_identical(self, coco_dir):
        """``num_workers`` parallel fetch yields bit-identical batches in
        the same order as the single-thread path — augmentation draws are
        keyed on (seed, epoch, rank, batch index), not worker schedule."""
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=True)

        def run(num_workers):
            loader = Loader(ds, TrainTransform(short_sides=(32, 48),
                                               max_size=64),
                            batch_size=3, max_boxes=4, use_depth=True,
                            shuffle=True, seed=7, bucket_step=32,
                            pad_cap=64, num_workers=num_workers)
            loader.set_epoch(1)
            return list(loader)

        a, b = run(0), run(3)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)

    def test_num_workers_exception_propagates(self, coco_dir):
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=False)

        class Broken:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                if i == 5:
                    raise OSError("corrupt jpeg")
                return ds[i]

        loader = Loader(Broken(), EvalTransform(short_side=48, max_size=64),
                        batch_size=2, max_boxes=4, shuffle=False,
                        bucket_step=32, pad_cap=64, num_workers=2)
        with pytest.raises(OSError, match="corrupt jpeg"):
            list(loader)

    def test_video_loader_frame_batching(self, coco_dir):
        root, ann = coco_dir
        ds = CocoVideoDataset(str(root), ann, num_ref_frames=2,
                              use_depth=True, train=True)
        loader = Loader(ds, EvalTransform(short_side=48, max_size=64),
                        batch_size=2, max_boxes=4, use_depth=True,
                        shuffle=False, bucket_step=32, pad_cap=64)
        b = next(iter(loader))
        # batch dim = clips * (1 + num_ref_frames) frames
        assert b["image"].shape[0] == 2 * 3
        assert b["image"].shape[-1] == 4


class TestCacheMode:
    def test_cached_reads_match_disk(self, coco_dir):
        root, ann = coco_dir
        plain = CocoDetectionDataset(str(root), ann, use_depth=False)
        cached = CocoDetectionDataset(str(root), ann, use_depth=False,
                                      cache_mode=True)
        for i in (0, 3):
            a, b = plain[i][0], cached[i][0]
            np.testing.assert_array_equal(a.rgb, b.rgb)
            np.testing.assert_array_equal(a.boxes, b.boxes)

    def test_cache_sharding(self, coco_dir):
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, cache_mode=True,
                                  cache_rank=0, cache_world=2)
        # half the images cached, the rest fall back to disk reads
        assert 0 < len(ds._cache) < len(ds.ids)
        s = ds[1][0]  # uncached index still loads
        assert s.rgb.shape == (48, 64, 3)


class TestLoaderErrors:
    def test_worker_exception_propagates(self, coco_dir):
        """Regression: a corrupt sample must raise in the consumer, not
        silently end the epoch."""
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=False)

        class Broken:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                if i == 2:
                    raise OSError("corrupt jpeg")
                return ds[i]

        loader = Loader(Broken(), EvalTransform(short_side=48, max_size=64),
                        batch_size=2, max_boxes=4, shuffle=False,
                        bucket_step=32, pad_cap=64)
        with pytest.raises(OSError, match="corrupt jpeg"):
            list(loader)

    def test_first_batch_no_thread(self, coco_dir):
        root, ann = coco_dir
        ds = CocoDetectionDataset(str(root), ann, use_depth=False)
        loader = Loader(ds, EvalTransform(short_side=48, max_size=64),
                        batch_size=2, max_boxes=4, shuffle=False,
                        bucket_step=32, pad_cap=64)
        b = loader.first_batch()
        assert b["image"].shape[0] == 2
