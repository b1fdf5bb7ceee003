"""Clean-vs-degraded split evaluation for the temporal-win experiment.

`datasets/synth_rgbd_hard` (scripts/make_synth_rgbd.py --degrade)
corrupts every EVEN frame (motion blur + near-depth occluders in both
RGB and depth) and leaves odd frames clean. This scores a checkpoint
three ways — all val frames, degraded keys only (frame_id % 2 == 0),
clean keys only — so the ACCURACY table can show WHERE a temporal model
beats the single-frame one: the reference thesis's claim is that
reference frames recover degraded keys (`README.md:22-28`).

  # single-frame model
  python scripts/eval_split_report.py --resume output/synthhard_latefusion/best
  # TransVOD++ video model
  python scripts/eval_split_report.py --resume output/synthhard_transvod_pp/best \
      --temporal_mode transvod_pp --num_ref_frames 2
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser("eval_split_report")
    p.add_argument("--resume", required=True)
    p.add_argument("--coco_path", default="datasets/synth_rgbd_hard")
    p.add_argument("--temporal_mode", default="none",
                   choices=["none", "transvod", "transvod_pp"])
    p.add_argument("--num_ref_frames", type=int, default=2)
    p.add_argument("--short_side", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve with W8A8 int8 (ops/quant.py) — accuracy "
                        "drift side of the round-5 int8 probe")
    a = p.parse_args()
    if a.int8:
        from dfvod_tpu.ops import quant
        quant.set_mode("int8")
        print("serving mode: int8 (W8A8, ops/quant.py)")

    from dfvod_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    if a.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    from dfvod_tpu.data.dataset import build_dataset, make_transform
    from dfvod_tpu.data.loader import Loader
    from dfvod_tpu.models import build_model
    from dfvod_tpu.models.postprocess import postprocess
    from dfvod_tpu.parallel import make_mesh
    from dfvod_tpu.data.coco_eval import COCOEvaluator
    from dfvod_tpu.train.engine import make_eval_step
    from dfvod_tpu.utils import checkpoint as ckpt
    from dfvod_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                        TrainConfig)

    video = a.temporal_mode != "none"
    frames = (1 + a.num_ref_frames) if video else 1
    dataset_file = ("vid_multi_plusplus" if a.temporal_mode == "transvod_pp"
                    else "vid_multi" if video else "vid_single")
    cfg = Config(
        model=ModelConfig(use_depth=True, fusion_type="LateFusion",
                          num_classes=3, dilation=True,
                          with_box_refine=True,
                          temporal_mode=a.temporal_mode,
                          num_ref_frames=a.num_ref_frames,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=a.batch_size),
        data=DataConfig(coco_path=a.coco_path, use_depth=True,
                        dataset_file=dataset_file,
                        eval_short_side=a.short_side, max_size=512,
                        device_preprocess=True))
    model, _, _ = build_model(cfg)
    val_ds = build_dataset("val", cfg, temporal=video)
    mesh = make_mesh()
    loader = Loader(val_ds, make_transform(False, cfg),
                    batch_size=cfg.train.batch_size, shuffle=False,
                    max_boxes=cfg.data.max_boxes, use_depth=True,
                    mesh=mesh, device_preprocess=True)

    restored, _ = ckpt.load_checkpoint(a.resume)
    variables = {"params": restored["params"],
                 **restored.get("model_state", {})}

    fwd = make_eval_step(model)
    coco = val_ds.coco
    preds = {}
    for batch in loader:
        m = batch["mask"] if "mask" in batch else batch["size"]
        logits, boxes = fwd(variables, batch["image"], m)

        def key_rows(x):
            if frames == 1:
                return x
            return x.reshape(x.shape[0] // frames, frames,
                             *x.shape[1:])[:, 0]
        orig = key_rows(np.asarray(batch["orig_size"]))
        ids = key_rows(np.asarray(batch["image_id"]))
        res = postprocess(logits, boxes, orig.astype(np.float32),
                          top_k=100)
        res = {k: np.asarray(v) for k, v in res.items()}
        for b, i in enumerate(ids[:logits.shape[0]]):
            preds[int(i)] = {"scores": res["scores"][b],
                             "labels": res["labels"][b],
                             "boxes": res["boxes"][b]}

    splits = {
        "all": list(coco.getImgIds()),
        "degraded_keys": [i for i in coco.getImgIds()
                          if coco.loadImgs(i)[0]["frame_id"] % 2 == 0],
        "clean_keys": [i for i in coco.getImgIds()
                       if coco.loadImgs(i)[0]["frame_id"] % 2 == 1],
    }
    print(f"checkpoint: {a.resume}  mode: {a.temporal_mode}  "
          f"preds for {len(preds)} images")
    for name, ids in splits.items():
        ev = COCOEvaluator(coco, img_ids=ids)
        ev.update({i: preds[i] for i in ids if i in preds})
        ev.synchronize_between_processes()
        ev.accumulate()
        stats = ev.summarize(verbose=False)
        print(f"  {name:14s} ({len(ids):3d} imgs): "
              f"mAP@0.5={stats['mAP_50']:.4f}  mAP={stats['mAP']:.4f}")


if __name__ == "__main__":
    main()
