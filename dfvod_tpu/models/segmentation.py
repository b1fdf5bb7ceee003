"""Segmentation head — DETR panoptic/mask branch (``models/segmentation.py``).

Dormant in the reference (gated behind ``--masks``; its forward still
targets the original DETR transformer API, ``segmentation.py:43-70``), but
part of the component inventory: MHAttentionMap (per-query attention maps
over the memory), MaskHeadSmallConv (FPN-style upsampling conv head),
``dice_loss`` (``:178-193``), and PostProcessSegm (``:259-280``). The hand
focal losses that live in the reference file are in ``criterion.py``.

Adapted to this framework's trunk: ``MaskBranch`` consumes the stride-16/32
projected feature plus the raw backbone stage maps (the FPN laterals) and
the decoder queries, producing ``(B, Q, H/4, W/4)`` mask logits.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dfvod_tpu.models.layers import dense


def _gn_groups(channels: int, target: int = 8) -> int:
    """Largest group count <= target dividing channels (reference uses a
    flat 8, which always divides its 256-based channel counts)."""
    return next(g for g in range(min(target, channels), 0, -1)
                if channels % g == 0)


def dice_loss(inputs, targets, num_boxes):
    """``segmentation.py:178-193``: sigmoid + per-mask dice, sum / num_boxes.
    inputs/targets: (N, H*W)."""
    prob = jax.nn.sigmoid(inputs)
    numerator = 2 * (prob * targets).sum(-1)
    denominator = prob.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return loss.sum() / num_boxes


class MHAttentionMap(nn.Module):
    """2D attention map per (query, head) without the value projection
    (``segmentation.py:146-175``). Returns (B, Q, M, H, W)."""
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, mask=None):
        """q: (B, Q, C); k: (B, H, W, C); mask: (B, H, W) True=pad."""
        B, Q, C = q.shape
        _, H, W, _ = k.shape
        M = self.num_heads
        d = self.hidden_dim // M
        qh = dense(self.hidden_dim, name="q_linear")(q).reshape(B, Q, M, d)
        kh = dense(self.hidden_dim, name="k_linear")(k).reshape(B, H, W, M, d)
        logits = jnp.einsum("bqmd,bhwmd->bqmhw", qh, kh) / (d ** 0.5)
        if mask is not None:
            logits = jnp.where(mask[:, None, None], -1e9, logits)
        w = jax.nn.softmax(logits.reshape(B, Q, M, -1), axis=-1)
        return w.reshape(B, Q, M, H, W)


class MaskHeadSmallConv(nn.Module):
    """FPN-style conv upsampler (``segmentation.py:72-144``): 3x3 conv +
    GroupNorm(8) stages, each followed by a 1x1-adapted lateral from the
    next-higher-resolution backbone stage and 2x nearest upsampling."""
    dim: int                      # input channels (context + heads)
    context_dim: int              # trunk hidden dim

    @nn.compact
    def __call__(self, x, laterals: Sequence[jnp.ndarray]):
        """x: (N, H, W, dim); laterals: high->low stride (N, Hi, Wi, Ci)."""
        inter = [self.dim, self.context_dim // 2, self.context_dim // 4,
                 self.context_dim // 8, self.context_dim // 16]

        def conv_gn(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{name}_conv")(x)
            # reference uses GroupNorm(8); min() keeps tiny test dims legal
            return jax.nn.relu(nn.GroupNorm(
                num_groups=_gn_groups(x.shape[-1]), name=f"{name}_gn")(x))

        x = conv_gn(x, inter[0], "lay1")
        x = conv_gn(x, inter[1], "lay2")
        for i, lat in enumerate(laterals):
            lat = nn.Conv(inter[i + 2], (1, 1), name=f"adapter{i + 1}")(lat)
            x = nn.Conv(inter[i + 2], (3, 3), padding=((1, 1), (1, 1)),
                        name=f"lay{i + 3}_conv")(x)
            x = jax.image.resize(x, (x.shape[0], lat.shape[1], lat.shape[2],
                                     x.shape[3]), method="nearest")
            x = lat + x
            x = jax.nn.relu(nn.GroupNorm(
                num_groups=_gn_groups(x.shape[-1]), name=f"lay{i + 3}_gn")(x))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       name="out_lay")(x)


class MaskBranch(nn.Module):
    """DETRsegm's mask branch on this framework's trunk: per-query attention
    maps over the projected memory, concatenated to the context feature and
    upsampled through the backbone laterals."""
    hidden_dim: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, queries, memory_map, mask, laterals):
        """queries (B, Q, C); memory_map (B, H, W, C); mask (B, H, W);
        laterals: backbone stages high->low stride. -> (B, Q, Hm, Wm)."""
        B, Q, C = queries.shape
        _, H, W, _ = memory_map.shape
        att = MHAttentionMap(self.hidden_dim, self.num_heads,
                             name="bbox_attention")(
            queries, memory_map, mask)          # (B, Q, M, H, W)
        # expand context per query, concat attention maps as channels
        ctx = jnp.broadcast_to(memory_map[:, None],
                               (B, Q, H, W, C)).reshape(B * Q, H, W, C)
        att = att.transpose(0, 1, 3, 4, 2).reshape(B * Q, H, W,
                                                   self.num_heads)
        x = jnp.concatenate([ctx, att], axis=-1)
        lat_exp = [jnp.broadcast_to(l[:, None], (B, Q, *l.shape[1:])
                                    ).reshape(B * Q, *l.shape[1:])
                   for l in laterals]
        seg = MaskHeadSmallConv(C + self.num_heads, C,
                                name="mask_head")(x, lat_exp)
        Hm, Wm = seg.shape[1], seg.shape[2]
        return seg.reshape(B, Q, Hm, Wm)


def postprocess_panoptic(pred_logits, mask_logits, is_thing_map,
                         threshold: float = 0.85):
    """Panoptic merge — ``PostProcessPanoptic`` (``segmentation.py:282+``),
    host-side numpy (panoptic assembly is inherently per-image dynamic):
    filter by confidence & no-object class, argmax over kept masks per
    pixel, merge same-class stuff segments, drop empty segments.

    Returns a list (per image) of (seg_id_map (H, W) int32, segments_info)
    where segments_info = [{"id", "category_id", "isthing", "score"}].
    """
    import numpy as np
    logits = np.asarray(pred_logits)
    masks = np.asarray(mask_logits)
    B, Q, K = logits.shape
    results = []
    for b in range(B):
        e = np.exp(logits[b] - logits[b].max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        scores, labels = probs.max(-1), probs.argmax(-1)
        keep = (labels != K - 1) & (scores > threshold)
        scores, labels = scores[keep], labels[keep]
        m = masks[b][keep]                                # (n, H, W)
        if len(m) == 0:
            results.append((np.zeros(masks.shape[-2:], np.int32), []))
            continue
        # merge same-class stuff segments by summing mask logits
        merged, seg_labels, seg_scores = [], [], []
        stuff_slot = {}
        for k in range(len(m)):
            lab = int(labels[k])
            if is_thing_map.get(lab, True):
                merged.append(m[k])
                seg_labels.append(lab)
                seg_scores.append(float(scores[k]))
            elif lab in stuff_slot:
                merged[stuff_slot[lab]] = merged[stuff_slot[lab]] + m[k]
            else:
                stuff_slot[lab] = len(merged)
                merged.append(m[k])
                seg_labels.append(lab)
                seg_scores.append(float(scores[k]))
        stack = np.stack(merged)                          # (n', H, W)
        # panoptic semantics: every pixel belongs to the argmax segment
        # (the reference's per-pixel softmax argmax over mask logits);
        # tiny segments are dropped afterwards
        assign = stack.argmax(0)
        seg_map = np.zeros(assign.shape, np.int32)
        infos = []
        next_id = 1
        for k in range(len(merged)):
            area = int((assign == k).sum())
            if area <= 4:  # reference drops tiny segments
                continue
            seg_map[assign == k] = next_id
            infos.append({"id": next_id, "category_id": seg_labels[k],
                          "isthing": bool(is_thing_map.get(
                              seg_labels[k], True)),
                          "score": seg_scores[k], "area": area})
            next_id += 1
        results.append((seg_map, infos))
    return results


def postprocess_segm(mask_logits, target_sizes, threshold: float = 0.5):
    """``PostProcessSegm`` (``segmentation.py:259-280``): upsample mask
    logits to the padded input size, threshold at 0.5. Static-shape
    variant: resizes to the first target size (batched eval uses uniform
    buckets)."""
    B, Q = mask_logits.shape[:2]
    H, W = int(target_sizes[0][0]), int(target_sizes[0][1])
    m = jax.image.resize(mask_logits, (B, Q, H, W), method="bilinear")
    return jax.nn.sigmoid(m) > threshold
