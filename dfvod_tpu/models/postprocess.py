"""PostProcess: model outputs -> COCO-style detections.

Parity target: ``models/deformable_detr_single.py:569-603`` — sigmoid over
logits, top-100 over the flattened (query x class) scores, gather boxes,
cxcywh -> xyxy, scale to original image size.

Note: the reference computes a 2-class topk for 3-class outputs and then
immediately overwrites it with the all-class topk (``:587-589``); the
effective behavior is the all-class topk, which is what we implement.
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
    prob = jax.nn.sigmoid(pred_logits).reshape(B, Q * K)
    # clamp for small-Q configs (reference assumes Q*K >= 100)
    scores, topk_idx = jax.lax.top_k(prob, min(top_k, Q * K))
    topk_boxes = topk_idx // K
    labels = topk_idx % K
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1).astype(boxes.dtype)
    boxes = boxes * scale[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes}
