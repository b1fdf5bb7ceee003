"""SetCriterion — Hungarian-matched detection losses, fully batched.

Parity target: ``models/deformable_detr_single.py:373-566`` plus the
modified focal loss in ``models/segmentation.py:196-229``. All losses are
computed with the framework's static padded-target contract (labels (B,T),
boxes (B,T,4), valid (B,T)) and scatter/gather instead of python-side index
lists, so the whole criterion stays inside one jit region.

Quirky-but-load-bearing reference semantics reproduced exactly:
- ``modified_sigmoid_focal_loss``: per-class alpha table [0, 1, 0.001]
  (hand-class datasets), gamma=2 effective, and the in-place write that
  forces the last class channel to be the "no object" indicator
  (``segmentation.py:216``), then ``loss.mean(1).sum() / num_boxes`` scaled
  by the query count (``deformable_detr_single.py:413``).
- cardinality error is log-only (no gradient).
- ``num_boxes`` is averaged over data-parallel ranks via ``psum`` when an
  axis is present (replaces ``dist.all_reduce``, ``:520-524``).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dfvod_tpu.models import matcher as matcher_lib
from dfvod_tpu.utils.box_ops import (
    box_cxcywh_to_xyxy,
    elementwise_generalized_box_iou,
)


def modified_sigmoid_focal_loss(logits, targets_onehot, num_boxes,
                                gamma: float = 2.0,
                                alpha_table=(0.0, 1.0, 0.001)):
    """Reference hand-dataset focal loss (``segmentation.py:196-229``).

    targets_onehot: (B, Q, K) with K == num_classes (3). The last channel is
    overwritten with the no-object indicator before the BCE, mirroring the
    reference's in-place target mutation.
    """
    K = logits.shape[-1]
    assert K == len(alpha_table), (K, alpha_table)
    no_obj = (targets_onehot[..., 1] != 1).astype(targets_onehot.dtype)
    targets_onehot = targets_onehot.at[..., 2].set(no_obj)
    prob = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets_onehot)
    p_t = prob * targets_onehot + (1 - prob) * (1 - targets_onehot)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = jnp.asarray(alpha_table, loss.dtype)[None, None, :]
    loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_boxes


def sigmoid_focal_loss(logits, targets, num_boxes, alpha: float = 0.25,
                       gamma: float = 2.0):
    """Standard focal loss (``segmentation.py:231-256``)."""
    prob = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_boxes


def _bce_with_logits(logits, targets):
    return (jnp.clip(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class SetCriterion:
    """Functional criterion; call with model outputs + padded targets."""

    def __init__(self, num_classes: int, loss_cfg, matcher_backend="auto",
                 dec_layers: int = 6):
        self.num_classes = num_classes
        self.loss_cfg = loss_cfg
        self.matcher_backend = matcher_backend
        self.weight_dict = self._build_weight_dict(dec_layers)

    def _build_weight_dict(self, dec_layers: int = 6):
        wd = {"loss_ce": self.loss_cfg.cls_loss_coef,
              "loss_bbox": self.loss_cfg.bbox_loss_coef,
              "loss_giou": self.loss_cfg.giou_loss_coef}
        aux = {}
        for i in range(dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        aux.update({f"{k}_enc": v for k, v in wd.items()})
        wd.update(aux)
        # mask losses: last decoder layer only, like DETRsegm
        # (aux layers skip masks, ``deformable_detr_single.py:456-475``)
        wd["loss_mask"] = getattr(self.loss_cfg, "mask_loss_coef", 1.0)
        wd["loss_dice"] = getattr(self.loss_cfg, "dice_loss_coef", 1.0)
        return wd

    def _loss_masks(self, pred_masks, targets, assign, num_boxes):
        """Focal + dice on matched query masks (``:456-475`` / DETR
        ``loss_masks``): predictions bilinearly resized to the target
        mask resolution, per-mask pixel-mean focal and dice, normalized
        by num_boxes; invalid target slots contribute zero."""
        tm = targets["masks"].astype(jnp.float32)     # (B, T, Hm, Wm)
        B, T, Hm, Wm = tm.shape
        src = jnp.take_along_axis(
            pred_masks, assign[:, :, None, None].astype(jnp.int32),
            axis=1)                                    # (B, T, Hp, Wp)
        src = jax.image.resize(src.astype(jnp.float32), (B, T, Hm, Wm),
                               method="bilinear")
        s = src.reshape(B * T, Hm * Wm)
        t = tm.reshape(B * T, Hm * Wm)
        vf = targets["valid"].reshape(B * T).astype(jnp.float32)
        # sigmoid focal, alpha=0.25 gamma=2 (``segmentation.py:231-258``)
        p = jax.nn.sigmoid(s)
        ce = jnp.maximum(s, 0) - s * t + jnp.log1p(jnp.exp(-jnp.abs(s)))
        p_t = p * t + (1 - p) * (1 - t)
        a = self.loss_cfg.focal_alpha
        a_t = a * t + (1 - a) * (1 - t)
        focal = (a_t * ce * (1 - p_t) ** 2).mean(axis=1) * vf
        loss_mask = focal.sum() / num_boxes
        # dice (``segmentation.py:178-193``)
        num = 2 * (p * t).sum(axis=1)
        den = p.sum(axis=1) + t.sum(axis=1)
        dice = (1 - (num + 1) / (den + 1)) * vf
        loss_dice = dice.sum() / num_boxes
        return {"loss_mask": loss_mask, "loss_dice": loss_dice}

    def _loss_single(self, outputs, targets, num_boxes, axis_name=None):
        """Losses for one prediction set. Returns dict of scalars."""
        assign = matcher_lib.match(outputs, targets, self.loss_cfg,
                                   self.matcher_backend)
        logits = outputs["pred_logits"]            # (B, Q, K)
        boxes = outputs["pred_boxes"]              # (B, Q, 4)
        B, Q, K = logits.shape
        T = targets["labels"].shape[1]
        valid = targets["valid"]                   # (B, T)

        # ---- classification: scatter matched labels into (B, Q) class map;
        # invalid slots scatter out-of-range and are dropped.
        target_classes = jnp.full((B, Q), self.num_classes, jnp.int32)
        a_safe = jnp.where(valid, assign, Q)
        scat = jax.vmap(lambda tc, a, lab: tc.at[a].set(lab, mode="drop"))(
            target_classes, a_safe, targets["labels"].astype(jnp.int32))
        onehot = jax.nn.one_hot(scat, K + 1, dtype=logits.dtype)[..., :-1]
        if K == 3:
            loss_ce = modified_sigmoid_focal_loss(
                logits, onehot, num_boxes) * Q
        else:
            # reference's modified loss hard-codes the 3-class hand setup;
            # other class counts use the standard focal loss
            loss_ce = sigmoid_focal_loss(
                logits, onehot, num_boxes,
                alpha=self.loss_cfg.focal_alpha) * Q

        # ---- boxes: gather matched predictions per target slot
        src_boxes = jnp.take_along_axis(
            boxes, assign[:, :, None].astype(jnp.int32), axis=1)  # (B,T,4)
        vf = valid.astype(boxes.dtype)
        l1 = jnp.abs(src_boxes - targets["boxes"]).sum(-1) * vf
        loss_bbox = l1.sum() / num_boxes
        giou = elementwise_generalized_box_iou(
            box_cxcywh_to_xyxy(src_boxes),
            box_cxcywh_to_xyxy(targets["boxes"]))
        loss_giou = ((1.0 - giou) * vf).sum() / num_boxes

        # ---- cardinality (log-only, ``:421-433``)
        card_pred = jnp.sum(
            (jnp.argmax(logits, -1) != K - 1).astype(jnp.float32), axis=1)
        tgt_lengths = jnp.sum(valid.astype(jnp.float32), axis=1)
        card_err = jnp.mean(jnp.abs(card_pred - tgt_lengths))

        return {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
                "loss_giou": loss_giou,
                "cardinality_error": jax.lax.stop_gradient(card_err)}

    def __call__(self, outputs: Dict, targets: Dict,
                 axis_name: Optional[str] = None):
        """Returns (total_weighted_loss, dict of unweighted components)."""
        num_boxes = jnp.sum(targets["valid"].astype(jnp.float32))
        if axis_name is not None:
            num_boxes = jax.lax.pmean(num_boxes, axis_name)
        num_boxes = jnp.clip(num_boxes, 1.0)

        losses = self._loss_single(
            {"pred_logits": outputs["pred_logits"],
             "pred_boxes": outputs["pred_boxes"]}, targets, num_boxes)

        if "pred_masks" in outputs and "masks" in targets:
            assign = matcher_lib.match(
                {"pred_logits": outputs["pred_logits"],
                 "pred_boxes": outputs["pred_boxes"]}, targets,
                self.loss_cfg, self.matcher_backend)
            losses.update(self._loss_masks(outputs["pred_masks"],
                                           targets, assign, num_boxes))

        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            l_aux = self._loss_single(aux, targets, num_boxes)
            losses.update({f"{k}_{i}": v for k, v in l_aux.items()
                           if k != "cardinality_error"})

        if "enc_outputs" in outputs:
            bin_targets = dict(targets)
            bin_targets["labels"] = jnp.zeros_like(targets["labels"])
            l_enc = self._loss_single(outputs["enc_outputs"], bin_targets,
                                      num_boxes)
            losses.update({f"{k}_enc": v for k, v in l_enc.items()
                           if k != "cardinality_error"})

        total = sum(losses[k] * w for k, w in self.weight_dict.items()
                    if k in losses)
        return total, losses
