"""Tests for offline tooling (rgb2d, yolo->coco, mean/std, visualization)
and the segmentation head."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from dfvod_tpu.tools.calculate_mean_std import compute_mean_std
from dfvod_tpu.tools.rgb2d import (
    convert_images_to_depth,
    normalize_depth_to_uint8,
)
from dfvod_tpu.tools.yolo_to_coco import yolo_folder_to_coco


class TestRgb2d:
    def test_normalize(self):
        d = np.array([[1.0, 3.0], [5.0, 1.0]])
        out = normalize_depth_to_uint8(d)
        assert out.dtype == np.uint8
        assert out.min() == 0 and out.max() == 255

    def test_tree_mirroring_with_stub_pipe(self, tmp_path):
        (tmp_path / "in" / "sub").mkdir(parents=True)
        for name in ("a.jpg", "sub/b.png"):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                tmp_path / "in" / name)

        class StubPipe:
            def __call__(self, image):
                return {"depth": np.arange(64.0).reshape(8, 8)}

        n = convert_images_to_depth(str(tmp_path / "in"),
                                    str(tmp_path / "out"), pipe=StubPipe())
        assert n == 2
        assert (tmp_path / "out" / "a.jpg").exists()
        assert (tmp_path / "out" / "sub" / "b.png").exists()
        d = np.asarray(Image.open(tmp_path / "out" / "a.jpg").convert("L"))
        assert d.max() > 200  # normalized to full range


class TestYoloToCoco:
    def test_flat_conversion(self, tmp_path):
        img_dir = tmp_path / "images"
        lbl_dir = tmp_path / "labels"
        img_dir.mkdir()
        lbl_dir.mkdir()
        Image.fromarray(np.zeros((40, 80, 3), np.uint8)).save(
            img_dir / "f0.jpg")
        (lbl_dir / "f0.txt").write_text("0 0.5 0.5 0.25 0.5\n")
        coco = yolo_folder_to_coco(str(img_dir), str(lbl_dir))
        assert len(coco["images"]) == 1
        ann = coco["annotations"][0]
        # cx=40,cy=20,w=20,h=20 -> xywh (30, 10, 20, 20)
        np.testing.assert_allclose(ann["bbox"], [30, 10, 20, 20])
        assert ann["category_id"] == 1
        assert coco["images"][0]["video_id"] == 1

    def test_nested_videos(self, tmp_path):
        img_dir = tmp_path / "images"
        lbl_dir = tmp_path / "labels"
        for v in ("v1", "v2"):
            (img_dir / v).mkdir(parents=True)
            (lbl_dir / v).mkdir(parents=True)
            for i in range(2):
                Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                    img_dir / v / f"f{i}.jpg")
        coco = yolo_folder_to_coco(str(img_dir), str(lbl_dir), nested=True)
        assert len(coco["videos"]) == 2
        assert [im["frame_id"] for im in coco["images"]] == [0, 1, 0, 1]


class TestMeanStd:
    def test_constant_image(self, tmp_path):
        Image.fromarray(np.full((8, 8, 3), 128, np.uint8)).save(
            tmp_path / "x.png")
        mean, std = compute_mean_std(str(tmp_path))
        np.testing.assert_allclose(mean, 128 / 255, atol=1e-6)
        np.testing.assert_allclose(std, 0, atol=1e-6)


class TestSegmentation:
    def test_mask_branch_shapes(self, rng):
        import jax
        import jax.numpy as jnp
        from dfvod_tpu.models.segmentation import MaskBranch, dice_loss

        B, Q, C, H, W = 1, 4, 32, 8, 8
        queries = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
        memory = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        mask = jnp.zeros((B, H, W), bool)
        laterals = [jnp.asarray(rng.standard_normal((B, 16, 16, 24)),
                                jnp.float32),
                    jnp.asarray(rng.standard_normal((B, 32, 32, 16)),
                                jnp.float32)]
        m = MaskBranch(hidden_dim=C, num_heads=4)
        v = jax.jit(lambda r: m.init(r, queries, memory, mask, laterals))(
            jax.random.PRNGKey(0))
        out = jax.jit(lambda v: m.apply(v, queries, memory, mask,
                                        laterals))(v)
        assert out.shape == (B, Q, 32, 32)

        # dice loss sanity: perfect prediction -> ~0
        t = (np.asarray(out).reshape(Q, -1) > 0).astype(np.float32)
        loss = dice_loss(jnp.asarray(np.where(t > 0, 20.0, -20.0)),
                         jnp.asarray(t), num_boxes=Q)
        assert float(loss) < 0.05

    def test_visualization_smoke(self, tmp_path, rng):
        pytest.importorskip("matplotlib")
        from dfvod_tpu.utils import visualization as viz
        img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
        viz.visualize_feature_map(
            rng.standard_normal((8, 12, 6)).astype(np.float32),
            str(tmp_path / "f.png"))
        viz.visualize_attention_map(
            img, rng.random((8, 12)).astype(np.float32),
            str(tmp_path / "a.png"))
        viz.visualize_sampling_locations(
            img, rng.random((2, 4, 1, 4, 2)).astype(np.float32),
            rng.random((2, 4, 1, 4)).astype(np.float32),
            str(tmp_path / "s.png"))
        os.path.exists(tmp_path / "f.png")
        d = tmp_path / "logs"
        d.mkdir()
        (d / "log.txt").write_text(json.dumps(
            {"epoch": 0, "train_loss": 1.0}) + "\n" + json.dumps(
            {"epoch": 1, "train_loss": 0.5}) + "\n")
        viz.plot_logs([str(d)], path=str(tmp_path / "curves.png"))
        assert (tmp_path / "curves.png").exists()
        viz.visualize_queries(rng.standard_normal(64), str(tmp_path / "q1.png"))
        viz.visualize_queries(rng.standard_normal((10, 64)),
                              str(tmp_path / "q2.png"))
        viz.visualize_position_embeddings(
            rng.standard_normal((8, 12, 32)), str(tmp_path / "pe.png"),
            num_channels=8)
        viz.visualize_attention_points(
            rng.random((8, 12)), rng.random((2, 4, 1, 4, 2)),
            rng.random((2, 4, 1, 4)), str(tmp_path / "ap.png"))
        for f in ("q1.png", "q2.png", "pe.png", "ap.png"):
            assert (tmp_path / f).exists()


class TestPanoptic:
    def test_postprocess_panoptic_merges_stuff(self, rng):
        from dfvod_tpu.models.segmentation import postprocess_panoptic
        B, Q, K, H, W = 1, 4, 3, 8, 8
        logits = np.full((B, Q, K), -8.0, np.float32)
        # q0: thing class 0 high conf; q1+q2: stuff class 1; q3: no-object
        logits[0, 0, 0] = 8.0
        logits[0, 1, 1] = 8.0
        logits[0, 2, 1] = 8.0
        logits[0, 3, 2] = 8.0
        masks = np.full((B, Q, H, W), -10.0, np.float32)
        masks[0, 0, :4] = 10.0        # top half = thing
        masks[0, 1, 4:, :4] = 10.0    # bottom-left = stuff
        masks[0, 2, 4:, 4:] = 10.0    # bottom-right = same stuff class
        out = postprocess_panoptic(logits, masks,
                                   is_thing_map={0: True, 1: False},
                                   threshold=0.5)
        seg_map, infos = out[0]
        # 2 segments: one thing + one merged stuff
        assert len(infos) == 2
        cats = sorted(i["category_id"] for i in infos)
        assert cats == [0, 1]
        stuff = [i for i in infos if i["category_id"] == 1][0]
        assert stuff["area"] == 32  # merged bottom half
        assert not stuff["isthing"]
        assert set(np.unique(seg_map)) <= {0, 1, 2}


class TestYoloEval:
    def _write(self, d, name, lines):
        (d / name).write_text("\n".join(lines) + "\n")

    def test_perfect_predictions(self, tmp_path):
        from dfvod_tpu.tools.yolo_eval import evaluate_yolo_dirs
        gt = tmp_path / "gt"; pr = tmp_path / "pred"
        gt.mkdir(); pr.mkdir()
        self._write(gt, "a.txt", ["Hand 0.5 0.5 0.2 0.2"])
        self._write(pr, "a.txt", ["Hand 0.5 0.5 0.2 0.2 0.9"])
        s = evaluate_yolo_dirs(str(gt), str(pr))
        assert s["ap50"] == 1.0 and s["f1"] == 1.0

    def test_fp_and_miss(self, tmp_path):
        from dfvod_tpu.tools.yolo_eval import evaluate_yolo_dirs
        gt = tmp_path / "gt"; pr = tmp_path / "pred"
        gt.mkdir(); pr.mkdir()
        self._write(gt, "a.txt", ["Hand 0.5 0.5 0.2 0.2",
                                  "Hand 0.2 0.2 0.1 0.1"])
        # one hit (high score), one far-away FP (low score)
        self._write(pr, "a.txt", ["Hand 0.5 0.5 0.2 0.2 0.9",
                                  "Hand 0.8 0.8 0.1 0.1 0.3"])
        s = evaluate_yolo_dirs(str(gt), str(pr))
        # AP: recall caps at 0.5 with precision 1 -> ~0.5
        assert abs(s["ap50"] - 0.5) < 0.02
        assert s["recall"] == 0.5 and s["precision"] == 1.0

    def test_duplicate_counts_once(self, tmp_path):
        from dfvod_tpu.tools.yolo_eval import evaluate_yolo_dirs
        gt = tmp_path / "gt"; pr = tmp_path / "pred"
        gt.mkdir(); pr.mkdir()
        self._write(gt, "a.txt", ["Hand 0.5 0.5 0.2 0.2"])
        self._write(pr, "a.txt", ["Hand 0.5 0.5 0.2 0.2 0.9",
                                  "Hand 0.5 0.5 0.2 0.2 0.8"])
        s = evaluate_yolo_dirs(str(gt), str(pr))
        assert s["recall"] == 1.0  # second is FP, first matched
        assert s["f1"] == 1.0      # best threshold excludes the dup
