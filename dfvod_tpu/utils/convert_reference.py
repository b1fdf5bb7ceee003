"""Reference (PyTorch) checkpoint -> dfvod_tpu parameter conversion.

Lets a user of the reference repo load their trained ``checkpoint.pth``
into this framework. Covers the full single-frame surface (Baseline +
LateFusion + Encoder-CrossFusion) and the TransVOD/TransVOD++ temporal
heads; every rule cites the reference module it mirrors.

Conventions:
- torch ``Linear.weight`` (out, in) -> flax ``kernel`` (in, out): transpose
- torch ``Conv2d.weight`` (O, I, kh, kw) -> flax ``kernel`` (kh, kw, I, O)
- torch ``LayerNorm/GroupNorm/BatchNorm.weight`` -> ``scale``
- torch ``nn.MultiheadAttention`` packed ``in_proj_weight`` (3C, C) ->
  separate q/k/v projections (``models/layers.MultiHeadAttention``)
- FrozenBN buffers -> the ``constants`` collection; DFormer BN stats ->
  ``batch_stats``

Use: ``params, model_state = convert_reference_state_dict(sd, target)``
where ``sd`` maps torch names to numpy arrays (``load_torch_state_dict``)
and ``target`` is a freshly initialized variables dict (provides the
shapes + with_box_refine layout).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from dfvod_tpu.utils.checkpoint import (
    convert_torchvision_resnet50,
    merge_matching,
)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a torch checkpoint (cpu) into {name: np.ndarray}; accepts
    both raw state dicts and the reference's ``{'model': ...}`` wrapper
    (``main.py:499``)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        # reference wrappers: {'model': ...} (``main.py:499``) or a
        # DFormer pretrain's {'state_dict': ...}
        # (``dformer_backbone.py:174``)
        obj = obj.get("model", obj.get("state_dict", obj))
    sd = obj
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _t(w):  # Linear weight -> kernel
    return np.transpose(w, (1, 0))


def _conv(w):  # Conv2d weight -> kernel
    return np.transpose(w, (2, 3, 1, 0))


def _ln(leaf: str) -> str:
    return {"weight": "scale", "bias": "bias"}[leaf]


def _emit_linear(out, path, leaf, w):
    out.setdefault("params", []).append(
        (path + ("kernel" if leaf == "weight" else "bias",),
         _t(w) if leaf == "weight" else w))


def _emit_ln(out, path, leaf, w):
    out.setdefault("params", []).append((path + (_ln(leaf),), w))


def _emit_mha(out, base, rest, w):
    """torch MultiheadAttention -> q/k/v/out_proj."""
    C = w.shape[-1] if w.ndim == 2 else w.shape[0] // 3
    if rest == "in_proj_weight":
        for name, chunk in zip(("q_proj", "k_proj", "v_proj"),
                               np.split(w, 3, axis=0)):
            out["params"].append((base + (name, "kernel"), _t(chunk)))
    elif rest == "in_proj_bias":
        for name, chunk in zip(("q_proj", "k_proj", "v_proj"),
                               np.split(w, 3, axis=0)):
            out["params"].append((base + (name, "bias"), chunk))
    elif rest == "out_proj.weight":
        out["params"].append((base + ("out_proj", "kernel"), _t(w)))
    elif rest == "out_proj.bias":
        out["params"].append((base + ("out_proj", "bias"), w))


_MSDA_LEAVES = ("sampling_offsets", "attention_weights", "value_proj",
                "output_proj")


def _emit_generic(out, base, rest, w):
    """Shared leaf translation for attention/FFN/norm submodules.

    rest examples: 'self_attn.value_proj.weight', 'norm1.bias',
    'linear1.weight', 'in_proj_weight' (under an MHA base).
    Returns True when handled.
    """
    parts = rest.split(".")
    if parts[0] in ("self_attn", "cross_attn") and len(parts) >= 2:
        sub = parts[1]
        if sub in _MSDA_LEAVES:        # deformable attention (MSDA)
            _emit_linear(out, base + (parts[0], sub), parts[2], w)
            return True
        # vanilla MHA
        _emit_mha(out, base + (parts[0],), ".".join(parts[1:]), w)
        return True
    if parts[0].startswith("norm") or parts[0] == "norm_depth_scale":
        _emit_ln(out, base + (parts[0],), parts[1], w)
        return True
    if parts[0].startswith("linear") or parts[0] in (
            "depth_scale_adapt", "cross_scale_adapt", "dynamic_layer",
            "out_layer"):
        _emit_linear(out, base + (parts[0],), parts[1], w)
        return True
    return False


def _map_ffn(base, norm_name: str):
    """Return a rewriter that maps torch linear1/linear2/normN onto the
    FFN submodule layout (``models/layers.FFN`` / ``SingleLinearFFN``)."""

    def rw(rest):
        parts = rest.split(".")
        if parts[0] in ("linear1", "linear2"):
            return base + ("ffn", parts[0])
        if parts[0] == norm_name:
            return base + ("ffn", "norm")
        return None

    return rw


# top-level module names of the temporal (video) wrapper; everything else
# nests under its inner ``detr`` module (``models/temporal.py::setup``)
_TEMPORAL_TOP = ("temporal_query_layer", "temporal_decoder",
                 "temporal_encoder_layer", "temp_head", "qrf_dynamic_layer")


def _nest_for_video(tree: dict) -> dict:
    """Re-nest a converted single-frame tree for the TemporalDeformableDETR
    layout: spatial modules live under ``detr``, temporal heads stay top."""
    out: dict = {"detr": {}}
    for k, v in tree.items():
        if any(k.startswith(p) for p in _TEMPORAL_TOP):
            out[k] = v
        else:
            out["detr"][k] = v
    return out


def convert_reference_state_dict(sd: Mapping[str, np.ndarray],
                                 with_box_refine: bool = True,
                                 verbose: bool = True,
                                 video: bool = False):
    """Translate a reference checkpoint into (params, model_state) trees
    (nested dicts) for this framework. Unrecognized keys are reported.
    ``video=True`` targets the TemporalDeformableDETR layout (spatial
    modules nested under ``detr``)."""
    out = {"params": [], "constants": [], "batch_stats": []}
    unmapped = []

    # --- ResNet RGB backbone (``backbone_scratch.py``) -----------------
    resnet_sd = {k[len("backbone.0.body."):]: v for k, v in sd.items()
                 if k.startswith("backbone.0.body.")}
    rp, rc = convert_torchvision_resnet50(resnet_sd)

    def flatten_into(tree, prefix, sink):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten_into(v, prefix + (k,), sink)
            else:
                sink.append((prefix + (k,), v))

    flatten_into(rp, ("backbone",), out["params"])
    flatten_into(rc, ("backbone",), out["constants"])

    for name, w in sd.items():
        if name.startswith("backbone.0.body.") or \
                "num_batches_tracked" in name:
            continue
        handled = _convert_one(name, w, out, with_box_refine)
        if not handled:
            unmapped.append(name)

    if verbose and unmapped:
        print(f"[convert] {len(unmapped)} unmapped reference keys "
              f"(first: {unmapped[:5]})")

    def build(pairs):
        tree: dict = {}
        for path, w in pairs:
            d = tree
            for p in path[:-1]:
                d = d.setdefault(p, {})
            d[path[-1]] = np.asarray(w)
        return tree

    params = build(out["params"])
    model_state = {}
    if out["constants"]:
        model_state["constants"] = build(out["constants"])
    if out["batch_stats"]:
        model_state["batch_stats"] = build(out["batch_stats"])
    if video:
        params = _nest_for_video(params)
        model_state = {k: _nest_for_video(v)
                       for k, v in model_state.items()}
    return params, model_state, unmapped


def _convert_one(name: str, w, out, with_box_refine: bool) -> bool:
    p = name.split(".")

    # --- DFormer depth backbone (``dformer_backbone.py:18-72``) --------
    m = re.match(r"depth_backbone\.0\.depth_backbone\."
                 r"downsample_layers_e\.(\d+)\.(\d+)\.(.+)", name)
    if m:
        stage, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        base = ("depth_backbone", "downsample_path")
        if stage == 0:
            mod = {0: "stem_conv1", 1: "stem_bn1", 3: "stem_conv2",
                   4: "stem_bn2"}[j]
        else:
            mod = {0: f"stage{stage}_bn", 1: f"stage{stage}_conv"}[j]
        if "conv" in mod:
            out["params"].append(
                (base + (mod, "kernel" if leaf == "weight" else "bias"),
                 _conv(w) if leaf == "weight" else w))
        else:  # trainable BatchNorm: affine -> params, stats -> batch_stats
            if leaf in ("weight", "bias"):
                out["params"].append((base + (mod, _ln(leaf)), w))
            elif leaf == "running_mean":
                out["batch_stats"].append((base + (mod, "mean"), w))
            elif leaf == "running_var":
                out["batch_stats"].append((base + (mod, "var"), w))
        return True

    # --- Backbone Cross-Fusion (``dformer_crossfusion_backbone.py``) ---
    # depth path lives flat inside our CrossFusionBackbone
    m = re.match(r"backbone\.0\.d_body\.downsample_layers_e\."
                 r"(\d+)\.(\d+)\.(.+)", name)
    if m:
        stage, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        if stage == 0:
            mod = {0: "stem_conv1", 1: "stem_bn1", 3: "stem_conv2",
                   4: "stem_bn2"}[j]
        else:
            mod = {0: f"stage{stage}_bn", 1: f"stage{stage}_conv"}[j]
        base = ("backbone",)
        if "conv" in mod:
            out["params"].append(
                (base + (mod, "kernel" if leaf == "weight" else "bias"),
                 _conv(w) if leaf == "weight" else w))
        elif leaf in ("weight", "bias"):
            out["params"].append((base + (mod, _ln(leaf)), w))
        elif leaf == "running_mean":
            out["batch_stats"].append((base + (mod, "mean"), w))
        elif leaf == "running_var":
            out["batch_stats"].append((base + (mod, "var"), w))
        return True
    m = re.match(r"backbone\.0\.((?:input|output)_(?:rgb|d)_proj\d)\."
                 r"([01])\.(.+)", name)
    if m:
        mod, j, leaf = m.group(1), m.group(2), m.group(3)
        if j == "0":
            out["params"].append(
                (("backbone", mod, "conv",
                  "kernel" if leaf == "weight" else "bias"),
                 _conv(w) if leaf == "weight" else w))
        else:
            out["params"].append((("backbone", mod, "gn", _ln(leaf)), w))
        return True
    m = re.match(r"backbone\.0\.((?:d2r|r2d)_fusion\d)\.(.+)", name)
    if m:
        return _convert_block(out, ("backbone", m.group(1)), m.group(2),
                              w, ffn_norm="norm3")

    # --- input projections (``deformable_detr_single.py:101-150``) -----
    m = re.match(r"(input_proj|input_proj_depth)\.(\d+)\.([01])\.(.+)",
                 name)
    if m:
        which, i, j, leaf = (m.group(1), int(m.group(2)), m.group(3),
                             m.group(4))
        base = (f"{which}_{i}", "conv" if j == "0" else "gn")
        if j == "0":
            out["params"].append(
                (base[:1] + ("conv",
                             "kernel" if leaf == "weight" else "bias"),
                 _conv(w) if leaf == "weight" else w))
        else:
            out["params"].append((base[:1] + ("gn", _ln(leaf)), w))
        return True

    # --- detection heads ------------------------------------------------
    m = re.match(r"(?:transformer\.decoder\.)?class_embed\.(\d+)\.(.+)",
                 name)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        head = f"head_{i}" if with_box_refine else "head_shared"
        if not with_box_refine and i > 0:
            return True  # shared heads: indices are duplicates
        _emit_linear(out, ("transformer", head, "class_embed"), leaf, w)
        return True
    m = re.match(r"(?:transformer\.decoder\.)?bbox_embed\.(\d+)\."
                 r"layers\.(\d+)\.(.+)", name)
    if m:
        i, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        head = f"head_{i}" if with_box_refine else "head_shared"
        if not with_box_refine and i > 0:
            return True
        _emit_linear(out, ("transformer", head, f"bbox_layers_{j}"),
                     leaf, w)
        return True

    # --- temporal heads (TransVOD / ++) ---------------------------------
    m = re.match(r"temp_class_embed(?:_list\.(\d+))?\.(.+)", name)
    if m:
        head = (f"temp_head_{m.group(1)}" if m.group(1) is not None
                else "temp_head")
        _emit_linear(out, (head, "class_embed"), m.group(2), w)
        return True
    m = re.match(r"temp_bbox_embed(?:_list\.(\d+))?\.layers\.(\d+)\.(.+)",
                 name)
    if m:
        head = (f"temp_head_{m.group(1)}" if m.group(1) is not None
                else "temp_head")
        _emit_linear(out, (head, f"bbox_layers_{m.group(2)}"),
                     m.group(3), w)
        return True

    if name == "query_embed.weight":
        out["params"].append((("transformer", "query_embed"), w))
        return True
    if name == "transformer.level_embed":
        out["params"].append((("transformer", "level_embed"), w))
        return True
    if name.startswith("transformer.reference_points."):
        _emit_linear(out, ("transformer", "reference_points"),
                     p[-1], w)
        return True
    # two-stage proposal path (``deformable_transformer_single.py:85-90``)
    if name.startswith("transformer.enc_output_norm."):
        _emit_ln(out, ("transformer", "enc_output_norm"), p[-1], w)
        return True
    if name.startswith("transformer.enc_output."):
        _emit_linear(out, ("transformer", "enc_output"), p[-1], w)
        return True
    if name.startswith("transformer.pos_trans_norm."):
        _emit_ln(out, ("transformer", "pos_trans_norm"), p[-1], w)
        return True
    if name.startswith("transformer.pos_trans."):
        _emit_linear(out, ("transformer", "pos_trans"), p[-1], w)
        return True

    # --- encoder / decoder layers ---------------------------------------
    m = re.match(r"transformer\.encoder\.layers\.(\d+)\.(.+)", name)
    if m:
        base = ("transformer", f"encoder_layers_{m.group(1)}")
        return _convert_block(out, base, m.group(2), w, ffn_norm="norm2")
    m = re.match(r"transformer\.decoder\.layers\.(\d+)\.(.+)", name)
    if m:
        base = ("transformer", f"decoder_layers_{m.group(1)}")
        return _convert_block(out, base, m.group(2), w, ffn_norm="norm3")

    # --- fusion layers ----------------------------------------------------
    m = re.match(r"transformer\.depth_encoder_layer\.(.+)", name)
    if m:
        base = ("transformer", "depth_encoder_layer")
        return _convert_block(out, base, m.group(1), w, ffn_norm="norm3")
    m = re.match(r"transformer\.encoder\.fusion_layers\.(\d+)\.(.+)", name)
    if m:
        base = ("transformer", f"fusion_layers_{m.group(1)}")
        return _convert_block(out, base, m.group(2), w, ffn_norm="norm2")

    # --- temporal modules -------------------------------------------------
    m = re.match(r"transformer\.temporal_query_layer(\d)\.(.+)", name)
    if m:
        base = (f"temporal_query_layer{m.group(1)}",)
        return _convert_block(out, base, m.group(2), w, ffn_norm="norm3")
    m = re.match(r"transformer\.temporal_decoder(\d?)\.layers\.(\d+)\.(.+)",
                 name)
    if m:
        dec = f"temporal_decoder{m.group(1)}" if m.group(1) \
            else "temporal_decoder"
        base = (dec, f"layers_{m.group(2)}")
        return _convert_block(out, base, m.group(3), w, ffn_norm="norm3")
    m = re.match(r"transformer\.temporal_encoder_layer\.(.+)", name)
    if m:
        return _convert_block(out, ("temporal_encoder_layer",),
                              m.group(1), w, ffn_norm="norm3")
    m = re.match(r"transformer\.dynamic_layer_for_current_query1\.(.+)",
                 name)
    if m:
        rest = m.group(1)
        base = ("qrf_dynamic_layer1",)
        if rest.startswith("inst_interact."):
            return _emit_generic(out, base + ("inst_interact",),
                                 rest[len("inst_interact."):], w)
        if rest.startswith("self_attn."):
            _emit_mha(out, base + ("self_attn",),
                      rest[len("self_attn."):], w)
            return True
        return _emit_generic(out, base, rest, w)

    return False


def _convert_block(out, base, rest, w, ffn_norm: str) -> bool:
    """Attention block leaves; linear1/linear2/<ffn_norm> fold into the
    FFN submodule."""
    parts = rest.split(".")
    if parts[0] in ("linear1", "linear2"):
        _emit_linear(out, base + ("ffn", parts[0]), parts[1], w)
        return True
    if parts[0] == ffn_norm:
        _emit_ln(out, base + ("ffn", "norm"), parts[1], w)
        return True
    return _emit_generic(out, base, rest, w)


def load_reference_checkpoint(path: str, variables: dict,
                              with_box_refine: bool = True,
                              verbose: bool = True, video: bool = False):
    """One-call bridge: torch .pth -> merged variables for this framework."""
    sd = load_torch_state_dict(path)
    params, model_state, _ = convert_reference_state_dict(
        sd, with_box_refine, verbose, video=video)
    merged_params, report = merge_matching(variables["params"], params,
                                           verbose=verbose)
    new_vars = dict(variables)
    new_vars["params"] = merged_params
    for coll, tree in model_state.items():
        if coll in new_vars:
            new_vars[coll], _ = merge_matching(new_vars[coll], tree,
                                               verbose=verbose)
    return new_vars, report
