"""Per-image detection report on the OID val split (VERDICT r2 weak #6:
"report per-image detections alongside mAP" — 7 val images / 15 boxes is
too small for a bare mAP number to be trustworthy).

Loads a trained checkpoint, evaluates the val split exactly like the
training CLI (`--eval` path), then prints one row per val image: ground
-truth box count, detections above --thresh, and the best-IoU match per
GT box. Also reports mAP@0.5 / mAP@[.5:.95] from the same pass so the
table and the headline number come from one forward.

  python scripts/eval_oid_report.py --resume output/oid_joint/best \
      [--coco_path datasets/oid_hands] [--thresh 0.5] [--short_side 448]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def box_iou_xyxy(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def main():
    p = argparse.ArgumentParser("eval_oid_report")
    p.add_argument("--resume", required=True)
    p.add_argument("--coco_path", default="datasets/oid_hands")
    p.add_argument("--thresh", type=float, default=0.5)
    p.add_argument("--short_side", type=int, default=448)
    p.add_argument("--fusion_type", default="LateFusion")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon plugin ignores "
                        "JAX_PLATFORMS; see .claude/skills/verify)")
    p.add_argument("--int8", action="store_true",
                   help="serve with W8A8 int8 (ops/quant.py) — measures "
                        "the accuracy drift side of the round-5 int8 "
                        "probe")
    p.add_argument("--int8_seams", default="",
                   help="comma-separated seam allowlist for --int8 "
                        "(e.g. 'ffn,proj,conv3x3_c128,conv3x3_c512'); "
                        "empty = quantize every seam")
    a = p.parse_args()

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
    import jax

    use_depth = a.fusion_type != "Baseline"
    cfg = Config(
        model=ModelConfig(use_depth=use_depth, fusion_type=a.fusion_type,
                          num_classes=3, dilation=True,
                          with_box_refine=True,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=a.batch_size),
        data=DataConfig(coco_path=a.coco_path, use_depth=use_depth,
                        dataset_file="vid_single",
                        eval_short_side=a.short_side,
                        device_preprocess=True))
    model, _, _ = build_model(cfg)
    val_ds = build_dataset("val", cfg)
    mesh = make_mesh()
    loader = Loader(val_ds, make_transform(False, cfg),
                    batch_size=cfg.train.batch_size, shuffle=False,
                    max_boxes=cfg.data.max_boxes, use_depth=use_depth,
                    mesh=mesh, device_preprocess=True)

    restored, _ = ckpt.load_checkpoint(a.resume)
    variables = {"params": restored["params"], **restored.get(
        "model_state", {})}

    fwd = make_eval_step(model)
    if a.int8:
        # trace-time switch: set before the first fwd call traces so the
        # whole eval program is quantized
        from dfvod_tpu.ops import quant
        seams = tuple(a.int8_seams.split(",")) if a.int8_seams else None
        quant.set_mode("int8", seams=seams)
        print(f"serving mode: int8 (W8A8, ops/quant.py, "
              f"seams={a.int8_seams or 'all'})")
    evaluator = COCOEvaluator(val_ds.coco)
    per_image = {}
    for batch in loader:
        m = batch["mask"] if "mask" in batch else batch["size"]
        logits, boxes = fwd(variables, batch["image"], m)
        orig = np.asarray(batch["orig_size"])
        ids = np.asarray(batch["image_id"])
        res = postprocess(logits, boxes, orig.astype(np.float32),
                          top_k=100)
        res = {k: np.asarray(v) for k, v in res.items()}
        for b, img_id in enumerate(ids[:logits.shape[0]]):
            per_image[int(img_id)] = {
                "scores": res["scores"][b], "labels": res["labels"][b],
                "boxes": res["boxes"][b]}
        evaluator.update({i: per_image[i]
                          for i in map(int, ids[:logits.shape[0]])})
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = evaluator.summarize()

    coco = val_ds.coco
    print("\nPer-image report (score >= %.2f):" % a.thresh)
    print(f"{'image':34s} {'gt':>3s} {'det':>4s}  per-GT best IoU (matched det score)")
    n_gt_tot = n_match = 0
    for img_id in sorted(per_image):
        info = coco.loadImgs(img_id)[0]
        anns = coco.imgToAnns[img_id]
        gt = np.array([[x, y, x + w, y + h]
                       for x, y, w, h in (an["bbox"] for an in anns)],
                      np.float32).reshape(-1, 4)
        r = per_image[img_id]
        keep = r["scores"] >= a.thresh
        det = r["boxes"][keep].reshape(-1, 4)
        sc = r["scores"][keep]
        cells = []
        if len(gt) and len(det):
            iou = box_iou_xyxy(gt, det)
            for gi in range(len(gt)):
                di = int(iou[gi].argmax())
                cells.append(f"{iou[gi, di]:.2f}({sc[di]:.2f})")
                n_match += iou[gi, di] >= 0.5
        else:
            cells = ["-"] * len(gt)
        n_gt_tot += len(gt)
        print(f"{info['file_name']:34s} {len(gt):3d} {len(det):4d}  "
              + " ".join(cells))
    print(f"\nGT boxes matched at IoU>=0.5 with score>={a.thresh}: "
          f"{n_match}/{n_gt_tot}")
    print({k: round(float(v), 4) for k, v in stats.items()})


if __name__ == "__main__":
    main()
