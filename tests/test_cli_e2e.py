"""End-to-end CLI tests: train 1 epoch on a synthetic RGB-D COCO tree,
checkpoint, eval mAP, then run the inference CLI on the checkpoint.

This is the SURVEY.md §4(c) integration anchor (the reference's equivalent
is "run main.py and watch mAP").
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from dfvod_tpu.utils.config import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """coco_path layout the reference hard-codes (``vid_single.py:166-175``):
    images under coco/images, depth under coco/depth_pred, annotations
    train.json/val.json. One white box on black background per image."""
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "coco" / "images"
    depth_dir = root / "coco" / "depth_pred"
    ann_dir = root / "coco" / "annotations"
    for d in (img_dir, depth_dir, ann_dir):
        d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    h, w = 48, 64
    for i in range(1, 9):
        rgb = np.zeros((h, w, 3), np.uint8)
        x, y = int(rng.integers(8, 40)), int(rng.integers(8, 24))
        rgb[y:y + 16, x:x + 16] = 255
        name = f"im{i}.jpg"
        Image.fromarray(rgb).save(img_dir / name)
        Image.fromarray((rgb[..., 0]).astype(np.uint8)).save(
            depth_dir / name)
        images.append({"id": i, "file_name": name, "width": w, "height": h,
                       "video_id": 1, "frame_id": i - 1})
        annotations.append({"id": i, "image_id": i, "category_id": 1,
                            "bbox": [x, y, 16, 16], "area": 256,
                            "iscrowd": 0, "instance_id": 1,
                            "segmentation": [[x, y, x + 16, y,
                                              x + 16, y + 16, x, y + 16]]})
    ds = {"images": images, "annotations": annotations,
          "videos": [{"id": 1, "name": "v"}],
          "categories": [{"id": 1, "name": "Hand"}]}
    for split in ("train", "val"):
        (ann_dir / f"{split}.json").write_text(json.dumps(ds))
    return root


def tiny_train_cfg(coco_root, out_dir, **model_kw):
    kw = dict(
        num_classes=3, num_queries=12, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, dropout=0.0,
        num_feature_levels=1, fusion_type="Baseline",
        with_box_refine=True, dilation=True)
    kw.update(model_kw)
    model = ModelConfig(**kw)
    # num_devices=2: XLA CPU's collective rendezvous hard-aborts when 8
    # virtual devices contend for one physical core and a heavy step makes
    # participant threads arrive too late; 2 devices still exercise the
    # psum/allgather paths (full 8-device coverage lives in the lighter
    # sharding tests and dryrun_multichip)
    return Config(
        model=model,
        train=TrainConfig(epochs=1, batch_size=8, lr=5e-5, num_devices=2),
        loss=LossConfig(),
        data=DataConfig(coco_path=str(coco_root), max_boxes=8,
                        eval_short_side=48, max_size=64),
        output_dir=str(out_dir))


class TestTrainLoop:
    def test_train_eval_checkpoint(self, coco_tree, tmp_path):
        from dfvod_tpu.cli.main import train_loop
        out = tmp_path / "run"
        cfg = tiny_train_cfg(coco_tree, out)
        stats = train_loop(cfg)
        assert "mAP" in stats
        # artifacts: args.yaml, log.txt with train + eval lines, checkpoint
        assert (out / "args.yaml").exists()
        lines = [json.loads(x) for x in
                 (out / "log.txt").read_text().splitlines()]
        assert any("train_loss" in ln for ln in lines)
        assert any("eval" in ln for ln in lines)
        from dfvod_tpu.utils.checkpoint import load_checkpoint
        restored, step = load_checkpoint(str(out))
        assert step == 0 and "params" in restored

    def test_resume_weights_only(self, coco_tree, tmp_path):
        """Also exercises the on-device uint8 preprocessing path e2e."""
        import dataclasses
        from dfvod_tpu.cli.main import train_loop
        out = tmp_path / "run2"
        cfg = tiny_train_cfg(coco_tree, out)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, device_preprocess=True))
        train_loop(cfg)
        # resume into eval-only; must not crash and must load weights
        stats = train_loop(cfg, resume=str(out), eval_only=True)
        assert "mAP" in stats

    def test_frozen_weights_seg_only(self, coco_tree, tmp_path):
        """``--frozen_weights`` seg-only training (``main.py:223,452-453``
        + ``DETRsegm(freeze_detr=True)``): the detector checkpoint loads
        under the mask branch, every detector parameter stays frozen for
        the whole epoch, and the mask branch trains."""
        import jax
        from dfvod_tpu.cli.main import train_loop
        from dfvod_tpu.utils.checkpoint import load_checkpoint

        det_out = tmp_path / "det"
        train_loop(tiny_train_cfg(coco_tree, det_out))

        seg_out = tmp_path / "seg"
        cfg = tiny_train_cfg(coco_tree, seg_out, masks=True,
                             frozen_weights=str(det_out))
        stats = train_loop(cfg)
        assert "mAP" in stats

        det = load_checkpoint(str(det_out))[0]["params"]
        seg = load_checkpoint(str(seg_out))[0]["params"]
        assert "mask_branch" in seg
        # detector weights in the seg checkpoint == the frozen source
        flat_det = jax.tree_util.tree_flatten_with_path(det)[0]
        flat_seg = dict(jax.tree_util.tree_flatten_with_path(seg)[0])
        checked = 0
        for kp, v in flat_det:
            if any("mask_branch" in str(k) for k in kp):
                continue
            np.testing.assert_array_equal(np.asarray(flat_seg[kp]),
                                          np.asarray(v), err_msg=str(kp))
            checked += 1
        assert checked > 10
        # the mask branch moved away from its init
        init_cfg = tiny_train_cfg(coco_tree, tmp_path / "init", masks=True)
        from dfvod_tpu.models import build_model
        from dfvod_tpu.train import create_train_state
        model, _, _ = build_model(init_cfg)
        import numpy as _np
        batch = {"images": _np.zeros((2, 48, 64, 3), _np.float32),
                 "mask": _np.zeros((2, 48, 64), bool),
                 "labels": _np.ones((2, 4), _np.int32),
                 "boxes": _np.tile(_np.array([.5, .5, .2, .2], _np.float32),
                                   (2, 4, 1)),
                 "valid": _np.ones((2, 4), bool)}
        state0, _, _ = create_train_state(
            jax.random.PRNGKey(cfg.train.seed), model, init_cfg, batch, 1)
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(state0.params["mask_branch"]),
                jax.tree_util.tree_leaves(seg["mask_branch"])))
        assert moved, "mask branch did not train"

    def test_frozen_weights_requires_masks(self, coco_tree, tmp_path):
        from dfvod_tpu.cli.main import train_loop
        cfg = tiny_train_cfg(coco_tree, tmp_path / "x",
                             frozen_weights="whatever")
        with pytest.raises(AssertionError, match="segmentation"):
            train_loop(cfg)


class TestInferenceCLI:
    def test_folder_inference_outputs(self, coco_tree, tmp_path):
        from dfvod_tpu.cli.inference import run_inference
        out = tmp_path / "inf"
        cfg = tiny_train_cfg(coco_tree, out)
        results = run_inference(
            cfg=cfg, img_folder=str(coco_tree / "coco" / "images"),
            output_dir=str(out), keep_prob=0.0, save_txt=True,
            save_img=True)
        assert len(results) == 8
        txts = [f for f in os.listdir(out) if f.endswith(".txt")]
        pngs = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(txts) == 8 and len(pngs) == 8
        # YOLO line format: Hand cx cy w h prob
        content = (out / txts[0]).read_text().strip()
        if content:
            parts = content.splitlines()[0].split()
            assert parts[0] == "Hand" and len(parts) == 6


class TestMeshServing:
    def test_clip_parallel_fwd_matches_single_device(self, rng):
        """Multi-chip serving path: the clip's frame rows sharded over a
        ('clip', 'data') mesh must reproduce the single-device forward
        (params replicated, XLA inserts the temporal-head collectives)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dfvod_tpu.cli.inference import DeformableDETRInference
        from dfvod_tpu.parallel import make_mesh
        from dfvod_tpu.utils.config import Config, ModelConfig

        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=6, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=2, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            temporal_mode="transvod_pp", num_ref_frames=1,
            with_box_refine=True))
        F, H, W = 2, 64, 64
        images = jnp.asarray(rng.standard_normal((F, H, W, 3)),
                             jnp.float32)
        mask = jnp.zeros((F, H, W), bool)

        single = DeformableDETRInference(cfg)
        single._init_variables(images, mask)
        ref = single._fwd(single.variables, images, mask)

        mesh = make_mesh(jax.devices()[:2], clip=2)
        sharded = DeformableDETRInference(cfg, mesh=mesh)
        sharded.variables = single.variables
        got = sharded._fwd(sharded.variables, images, mask)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-5, rtol=1e-5)


class TestVideoTrainLoop:
    def test_transvod_pp_train_eval(self, coco_tree, tmp_path):
        """Video path e2e: CocoVideoDataset clips -> frame batching ->
        TransVOD++ -> key-frame criterion -> eval mAP."""
        import dataclasses
        from dfvod_tpu.cli.main import train_loop
        out = tmp_path / "vid"
        cfg = tiny_train_cfg(coco_tree, out, temporal_mode="transvod_pp",
                             num_ref_frames=3)  # 8 clips x 4 frames = 32
        stats = train_loop(cfg, video=True)
        assert "mAP" in stats
        lines = (out / "log.txt").read_text().splitlines()
        assert len(lines) >= 2


class TestDFormerWeightsE2E:
    def test_latefusion_train_with_dformer_pretrain(self, coco_tree,
                                                    tmp_path):
        """CLI train loop with --dformer_weights: the DFormer pretrain's
        stem lands in the depth backbone before training
        (``main.py:168``, ``dformer_backbone.py:161-198``)."""
        import dataclasses

        import torch

        from dfvod_tpu.cli.main import train_loop
        from dfvod_tpu.utils.checkpoint import load_checkpoint

        rng = np.random.default_rng(3)
        dims = [(16, 1), (32, 16), (64, 32), (128, 64)]
        sd = {}
        for (o, i), key in zip(dims, ("0.0", "0.3", "1.1", "2.1")):
            sd[f"downsample_layers_e.{key}.weight"] = torch.tensor(
                rng.standard_normal((o, i, 3, 3)).astype(np.float32))
            sd[f"downsample_layers_e.{key}.bias"] = torch.tensor(
                rng.standard_normal(o).astype(np.float32))
        for n, key in zip((16, 32, 32, 64), ("0.1", "0.4", "1.0", "2.0")):
            sd[f"downsample_layers_e.{key}.weight"] = torch.tensor(
                np.ones(n, np.float32))
            sd[f"downsample_layers_e.{key}.bias"] = torch.tensor(
                np.zeros(n, np.float32))
        pth = tmp_path / "dformer.pth"
        torch.save({"state_dict": sd}, pth)

        out = tmp_path / "run"
        cfg = tiny_train_cfg(coco_tree, out, fusion_type="LateFusion",
                             use_depth=True,
                             depth_backbone_type="dformer",
                             dformer_weights=str(pth))
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, use_depth=True))
        stats = train_loop(cfg)
        assert "mAP" in stats
        restored, _ = load_checkpoint(str(out))
        got = np.asarray(restored["params"]["depth_backbone"]
                         ["downsample_path"]["stem_conv1"]["kernel"])
        want = sd["downsample_layers_e.0.0.weight"].numpy(
        ).transpose(2, 3, 1, 0)
        # one low-lr epoch on tiny data barely moves the loaded weights;
        # an unloaded xavier init would differ at O(1)
        assert np.abs(got - want).max() < 0.05


class TestProfileTrace:
    def test_train_profile_dir(self, coco_tree, tmp_path):
        """--profile_dir captures a jax.profiler trace of early steps."""
        import dataclasses

        from dfvod_tpu.cli.main import train_loop
        out = tmp_path / "run"
        prof = tmp_path / "prof"
        cfg = tiny_train_cfg(coco_tree, out)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           profile_dir=str(prof)))
        train_loop(cfg)
        traces = list(prof.rglob("*.pb")) + list(prof.rglob("*.json.gz")) \
            + list(prof.rglob("*.xplane.pb"))
        assert traces, f"no trace artifacts under {prof}"


class TestAutoResume:
    def test_auto_resume_continues_with_optimizer(self, coco_tree, tmp_path):
        """Durability hook for scripts/supervise.py: a second train_loop
        with ``auto_resume=True`` must restore the FULL state (params,
        optax opt_state with its NamedTuple structure, epoch counter,
        best-mAP watermark) and continue from the next epoch rather than
        re-running epoch 0."""
        import dataclasses
        from dfvod_tpu.cli.main import train_loop
        from dfvod_tpu.utils.checkpoint import load_checkpoint

        out = tmp_path / "run"
        cfg = tiny_train_cfg(coco_tree, out)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=1,
                                           eval_every=1))
        train_loop(cfg)  # epoch 0 only; writes checkpoint + best_meta
        assert (out / "best_meta.json").exists()

        # "crashed after epoch 0" -> relaunch asking for 2 epochs total
        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=2,
                                           eval_every=1))
        train_loop(cfg2, auto_resume=True)
        lines = [json.loads(x) for x in
                 (out / "log.txt").read_text().splitlines()]
        epochs_trained = [ln["epoch"] for ln in lines if "epoch" in ln]
        # epoch 0 exactly once (from the first run), epoch 1 from resume
        assert epochs_trained.count(0) == 1, epochs_trained
        assert 1 in epochs_trained, epochs_trained
        restored, step = load_checkpoint(str(out))
        assert step == 1
        # optimizer state advanced: step counter equals total train steps
        assert int(np.asarray(restored["step"])) == 2 * max(
            1, 8 // cfg.train.batch_size)
