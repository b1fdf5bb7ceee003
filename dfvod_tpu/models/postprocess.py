"""PostProcess: model outputs -> COCO-style detections.

Parity target: ``models/deformable_detr_single.py:569-603`` — sigmoid over
logits, top-100 over the flattened (query x class) scores, gather boxes,
cxcywh -> xyxy, scale to original image size.

The reference's 3-class quirk (``:587-589``): it first computes the topk
EXCLUDING the last class ("For binary classification, remove the last
class") and then immediately overwrites it with the all-class topk — the
excluding line is dead code. The all-class behavior is demonstrably
broken: the criterion's ``modified_sigmoid_focal_loss`` trains channel 2
as the NO-OBJECT indicator (``segmentation.py:216-217``: unmatched
queries get target 1 on channel 2), so a converged model emits ~0.99 on
channel 2 for every background query and the all-class top-100 floods
with no-object "detections", pushing every real hand out — measured
mAP@0.5 = 0.0 on the synthetic labeled run (ACCURACY.md) with a model
whose channel-1 predictions were visibly correct. We implement the
INTENDED (dead-code) behavior — exclude the no-object channel when
K == 3 — and document the delta in PARITY.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dfvod_tpu.utils.box_ops import box_cxcywh_to_xyxy


@functools.partial(jax.jit, static_argnames=("top_k",))
def postprocess(pred_logits, pred_boxes, target_sizes, top_k: int = 100):
    """
    Args:
      pred_logits: (B, Q, K); pred_boxes: (B, Q, 4) normalized cxcywh.
      target_sizes: (B, 2) original (h, w) per image.
    Returns dict of scores (B, top_k), labels (B, top_k), boxes (B, top_k, 4)
    in absolute xyxy pixels.
    """
    B, Q, K = pred_logits.shape
    # K == 3: channel 2 is the no-object indicator (see module docstring)
    Ke = K - 1 if K == 3 else K
    prob = jax.nn.sigmoid(pred_logits[..., :Ke]).reshape(B, Q * Ke)
    # clamp for small-Q configs (reference assumes Q*K >= 100)
    scores, topk_idx = jax.lax.top_k(prob, min(top_k, Q * Ke))
    topk_boxes = topk_idx // Ke
    labels = topk_idx % Ke
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1).astype(boxes.dtype)
    boxes = boxes * scale[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes}
