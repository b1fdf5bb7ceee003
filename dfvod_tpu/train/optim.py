"""Optimizer construction with the reference's per-fusion-type parameter
policies (``main.py:292-435``), expressed as an optax ``multi_transform``
over a label tree instead of torch param groups.

Behavioral parity map (reference name pattern -> this framework's path):

- ``backbone.0.body``                  -> top-level ``backbone`` (RGB)
- ``depth_backbone``                   -> top-level ``depth_backbone``
- ``transformer.depth_encoder_layer``  -> ``transformer/depth_encoder_layer``
  (LateFusion's pre-encoder depth cross-attn)
- ``encoder.fusion_layers``            -> ``transformer/fusion_layers_{i}``
  (Encoder Cross-Fusion's interleaved fusion layers)
- ``d2r_fusion/r2d_fusion/rgb_proj/d_proj`` -> same substrings inside the
  cross-fusion backbone's module names
- ``reference_points`` / ``sampling_offsets`` -> same leaf module names

Policies (``main.py:310-421``):
- Baseline:       backbone 0.1x lr, linear-proj 0.1x, rest 1x
- LateFusion:     RGB backbone frozen; depth encoder 10x (1x if linear-proj
                  inside it); depth_backbone 1x; linear-proj 0.1x; rest 1x
- CrossFusion:    fusion modules 10x (1x if linear-proj); backbone 1x;
                  linear-proj 0.1x; rest 1x
- Encoder CF:     RGB backbone frozen; encoder fusion layers 10x (1x if
                  linear-proj); depth_backbone 1x; linear-proj 0.1x; rest 1x

Video fine-tuning adds the reference's "freeze all but temporal" mode
(``main_multi.py:380-386``): ``fixed_pretrained_model=True`` freezes every
parameter whose path does not contain a temporal/dynamic-head component.

Schedule: CosineAnnealingLR(T_max=epochs, eta_min=0.1*lr) stepped per epoch
(``main.py:433-435``) — implemented as a cosine on the *multiplier* so each
group keeps its own base LR. Optimizer: AdamW (or SGD momentum 0.9).
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import optax

LINEAR_PROJ_NAMES = ("reference_points", "sampling_offsets")
CROSSFUSION_NAMES = ("d2r_fusion", "r2d_fusion", "rgb_proj", "d_proj")
TEMPORAL_NAMES = ("temporal", "temp_head", "dynamic", "qrf")


def _contains(path: Tuple[str, ...], *subs: str) -> bool:
    return any(s in part for part in path for s in subs)


def param_group_label(path: Tuple[str, ...], fusion_type: str,
                      fixed_pretrained_model: bool = False,
                      temporal: bool = False,
                      freeze_detr: bool = False) -> str:
    """Label one parameter path. Labels: base | backbone | linear_proj |
    fusion10x | frozen.

    ``temporal=True`` (TransVOD/TransVOD++ training): the reference's
    video optimizer is a FLAT 2-group AdamW — base lr + 0.1x for the
    linear projections over all requires_grad params
    (``main_multi.py:282-293``) — the per-fusion freezing/10x policies
    apply only to single-frame training (``main.py:311-421``). The
    ``fixed_pretrained_model`` freeze-all-but-temporal mode
    (``main_multi.py:380-386``) still applies.

    ``freeze_detr=True`` (``--frozen_weights`` seg-only training): every
    parameter outside the mask branch is frozen, matching
    ``DETRsegm(..., freeze_detr=True)`` (``deformable_detr_single.py:681``,
    ``segmentation.py:31-36``); mask-branch params keep the normal group
    rules, like the reference's requires_grad-filtered param groups.
    """
    if freeze_detr and not _contains(path, "mask_branch"):
        return "frozen"
    if fixed_pretrained_model and not _contains(path, *TEMPORAL_NAMES):
        return "frozen"
    is_proj = _contains(path, *LINEAR_PROJ_NAMES)
    if temporal:
        return "linear_proj" if is_proj else "base"
    # the spatial trunk nests under "detr" inside temporal models; accept
    # both so the single-frame rules stay robust to wrapping
    rgb_backbone = (path[0] == "backbone"
                    or (len(path) > 1 and path[0] == "detr"
                        and path[1] == "backbone"))

    if fusion_type == "LateFusion":
        if rgb_backbone:
            return "frozen"
        if _contains(path, "depth_encoder_layer"):
            return "base" if is_proj else "fusion10x"
        return "linear_proj" if is_proj else "base"
    if fusion_type == "Backbone_CrossFusion":
        if _contains(path, *CROSSFUSION_NAMES):
            return "base" if is_proj else "fusion10x"
        if rgb_backbone:
            return "base"
        return "linear_proj" if is_proj else "base"
    if fusion_type == "Encoder_CrossFusion":
        if rgb_backbone:
            return "frozen"
        if _contains(path, "fusion_layers"):
            return "base" if is_proj else "fusion10x"
        return "linear_proj" if is_proj else "base"
    # Baseline (``main.py:404-421``)
    if rgb_backbone:
        return "backbone"
    return "linear_proj" if is_proj else "base"


def label_params(params, fusion_type: str,
                 fixed_pretrained_model: bool = False,
                 temporal: bool = False, freeze_detr: bool = False):
    """Map a param pytree to a same-shaped tree of group labels."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}
    for kp, _ in flat:
        path = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in kp)
        labels[path] = param_group_label(path, fusion_type,
                                         fixed_pretrained_model, temporal,
                                         freeze_detr)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [labels[tuple(getattr(k, "key", getattr(k, "name", str(k)))
                               for k in kp)] for kp, _ in flat])


def cosine_epoch_schedule(epochs: int, steps_per_epoch: int,
                          eta_min_mult: float) -> Callable:
    """CosineAnnealingLR(T_max=epochs) stepped per *epoch*, as a multiplier
    schedule on the step count (``main.py:433-435`` + per-epoch
    ``lr_scheduler.step()``)."""

    def sched(step):
        import jax.numpy as jnp
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), epochs)
        cos = 0.5 * (1 + jnp.cos(math.pi * epoch / max(epochs, 1)))
        return eta_min_mult + (1.0 - eta_min_mult) * cos

    return sched


def build_optimizer(params, model_cfg, train_cfg,
                    steps_per_epoch: int = 1000):
    """Returns (optax.GradientTransformation, labels tree).

    Gradient clipping (clip_max_norm, ``engine_single.py:63``) is applied
    globally before the per-group transforms, matching
    ``clip_grad_norm_(model.parameters())`` over all params.
    """
    mults = {"base": 1.0, "backbone": train_cfg.lr_backbone / train_cfg.lr,
             "linear_proj": train_cfg.lr_linear_proj_mult,
             "fusion10x": 10.0, "frozen": 0.0}
    sched = cosine_epoch_schedule(train_cfg.epochs, steps_per_epoch,
                                  train_cfg.cosine_eta_min_mult)

    def group(mult):
        if mult == 0.0:
            return optax.set_to_zero()
        lr = lambda step: train_cfg.lr * mult * sched(step)  # noqa: E731
        if train_cfg.sgd:
            return optax.inject_hyperparams(optax.sgd)(
                learning_rate=lr, momentum=0.9)
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=train_cfg.weight_decay)

    labels = label_params(params, model_cfg.fusion_type,
                          model_cfg.fixed_pretrained_model,
                          temporal=model_cfg.temporal_mode != "none",
                          freeze_detr=bool(model_cfg.frozen_weights))
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.clip_max_norm),
        optax.multi_transform({k: group(v) for k, v in mults.items()},
                              labels),
    )
    return tx, labels
