"""Evaluation loop — forward + PostProcess + COCO mAP accumulation.

Parity target: ``engine_single.py:81-165`` / ``engine_multi.py:83-166``
(model forward, top-100 postprocess, ``CocoEvaluator`` update per batch,
cross-process sync, accumulate/summarize).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.data.coco_eval import COCOEvaluator
from dfvod_tpu.models.postprocess import postprocess
from dfvod_tpu.utils.logging import MetricLogger


def evaluate(model, variables, loader, coco_gt, *, frames: int = 1,
             top_k: int = 100, print_freq: int = 10) -> Dict[str, float]:
    """Run COCO eval over a loader. ``frames``>1: batches carry
    clips*frames frame rows; predictions/ids are key frames only."""
    from dfvod_tpu.train.engine import make_eval_step
    fwd = make_eval_step(model)

    evaluator = COCOEvaluator(coco_gt)
    logger = MetricLogger(print_freq=print_freq)

    def key_rows(x):
        if frames == 1:
            return x
        return x.reshape(x.shape[0] // frames, frames, *x.shape[1:])[:, 0]

    for batch in logger.log_every(loader, header="Eval:"):
        m = batch["mask"] if "mask" in batch else batch["size"]
        logits, boxes = fwd(variables, batch["image"], m)
        orig = key_rows(np.asarray(batch["orig_size"]))
        ids = key_rows(np.asarray(batch["image_id"]))
        res = postprocess(logits, boxes, orig.astype(np.float32),
                          top_k=top_k)
        res = {k: np.asarray(v) for k, v in res.items()}
        preds = {int(i): {"scores": res["scores"][b],
                          "labels": res["labels"][b],
                          "boxes": res["boxes"][b]}
                 for b, i in enumerate(ids[:logits.shape[0]])}
        evaluator.update(preds)

    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    return evaluator.summarize()
