"""Checkpointing — orbax save/restore + the reference's key-surgery tools.

Reference semantics reproduced (SURVEY.md §5):
- ``torch.save({model, optimizer, lr_scheduler, epoch, args})`` every epoch
  plus a numbered copy every 5 (``main.py:574-585``) -> orbax
  ``CheckpointManager`` with ``save_interval_steps=1`` and keep policy.
- resume loads model weights only, ``strict=False`` with missing/unexpected
  key reporting (``main.py:499-512``) -> ``merge_matching`` which overlays
  only leaves that exist in both trees with matching shapes and reports the
  rest.
- ``--del_class_weights`` drops ``class_embed.*`` for class-count changes
  (``main.py:470-478``) -> ``drop_keys(tree, "class_embed")``.
- ``--transvod_temporal_weights`` / ``--spatial_weights`` three-way merge
  (``main_multi.py:342-364``) -> ``merge_temporal_weights``.

Also hosts the torch->flax weight converters (torchvision ResNet-50,
DFormer depth stem) needed for fp32 parity with reference checkpoints; they
take plain ``{name: np.ndarray}`` dicts so torch is only needed by the
caller that unpickles the file.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import jax
import numpy as np

TEMPORAL_KEY_PATTERNS = ("temporal_query", "temporal_decoder",
                         "temp_bbox_embed", "temp_class_embed",
                         "dynamic_layer", "temporal", "qrf")


# ---------------------------------------------------------------------------
# pytree key surgery
# ---------------------------------------------------------------------------

def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                    for k in kp)


def drop_keys(tree, *patterns: str):
    """Return tree with leaves whose path matches any pattern replaced by
    None markers removed — practically: a dict-tree filtered by path."""

    def keep(d, prefix=""):
        if not isinstance(d, Mapping):
            return d
        out = {}
        for k, v in d.items():
            p = f"{prefix}/{k}"
            if any(pat in p for pat in patterns):
                continue
            out[k] = keep(v, p)
        return out

    return keep(tree)


def select_keys(tree, *patterns: str):
    """Keep only subtrees whose path contains one of the patterns."""

    def walk(d, prefix=""):
        if not isinstance(d, Mapping):
            return d if any(pat in prefix for pat in patterns) else None
        out = {}
        for k, v in d.items():
            r = walk(v, f"{prefix}/{k}")
            if r is not None and (not isinstance(r, dict) or r):
                out[k] = r
        return out

    return walk(tree) or {}


def merge_matching(base, overlay, verbose: bool = True
                   ) -> Tuple[Any, Dict[str, list]]:
    """Overlay ``overlay`` onto ``base`` where paths+shapes match
    (torch ``load_state_dict(strict=False)`` semantics). Returns
    (merged, report) with report['missing'|'unexpected'|'shape_mismatch']."""
    report = {"missing": [], "unexpected": [], "shape_mismatch": []}

    flat_overlay = {}

    def flatten(d, prefix=()):
        if isinstance(d, Mapping):
            for k, v in d.items():
                flatten(v, prefix + (str(k),))
        else:
            flat_overlay[prefix] = d

    flatten(overlay)
    used = set()

    def walk(b, prefix=()):
        if isinstance(b, Mapping):
            return {k: walk(v, prefix + (str(k),)) for k, v in b.items()}
        if prefix in flat_overlay:
            o = flat_overlay[prefix]
            used.add(prefix)
            if np.shape(o) == np.shape(b):
                return jax.numpy.asarray(o, dtype=b.dtype) \
                    if hasattr(b, "dtype") else o
            report["shape_mismatch"].append("/".join(prefix))
            return b
        report["missing"].append("/".join(prefix))
        return b

    merged = walk(base)
    report["unexpected"] = ["/".join(p) for p in flat_overlay
                            if p not in used]
    if verbose:
        for k in ("missing", "unexpected", "shape_mismatch"):
            if report[k]:
                print(f"[checkpoint] {k} keys: {len(report[k])} "
                      f"(first: {report[k][:3]})")
    return merged, report


def merge_temporal_weights(params, temporal_params=None, spatial_params=None):
    """The TransVOD fine-tune surgery (``main_multi.py:342-364``):
    temporal-head keys from a TransVOD checkpoint + all keys from a spatial
    (fusion) checkpoint, overlaid onto current params."""
    merged = params
    if spatial_params is not None:
        # a SINGLE-FRAME checkpoint's trunk is top-level; inside the
        # temporal model it nests under ``detr`` (``models/temporal.py``)
        if "detr" in params and "detr" not in spatial_params:
            spatial_params = {"detr": spatial_params}
        merged, _ = merge_matching(merged, spatial_params)
    if temporal_params is not None:
        subset = select_keys(temporal_params, *TEMPORAL_KEY_PATTERNS)
        merged, _ = merge_matching(merged, subset)
    return merged


# ---------------------------------------------------------------------------
# orbax persistence
# ---------------------------------------------------------------------------

def _manager(output_dir: str, keep_every: int = 5):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(
        max_to_keep=3, keep_period=keep_every, create=True)
    return ocp.CheckpointManager(os.path.abspath(output_dir), options=options)


def save_checkpoint(output_dir: str, state, epoch: int, cfg=None,
                    keep_every: int = 5) -> None:
    """Save {model, optimizer, step, epoch} — numbered like
    ``checkpoint{epoch:04}.pth`` every ``keep_every`` epochs, latest kept
    (``main.py:574-585``). Multihost-safe (orbax coordinates ranks)."""
    import orbax.checkpoint as ocp
    mgr = _manager(output_dir, keep_every)
    payload = {"params": state.params, "model_state": state.model_state,
               "opt_state": state.opt_state,
               "step": state.step}
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(output_dir: str, state=None, epoch: Optional[int] = None,
                    weights_only: bool = True):
    """Restore. ``weights_only=True`` matches the reference resume (model
    weights only; optimizer/scheduler restart, ``main.py:522-540``)."""
    import orbax.checkpoint as ocp
    mgr = _manager(output_dir)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {output_dir}")
    if state is not None and not weights_only:
        # full-state restore (auto-resume): hand orbax the live payload as
        # the target so the optax opt_state comes back with its NamedTuple
        # structure instead of raw dicts
        target = {"params": state.params, "model_state": state.model_state,
                  "opt_state": state.opt_state, "step": state.step}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        mgr.close()
        return state.replace(params=restored["params"],
                             model_state=restored["model_state"],
                             opt_state=restored["opt_state"],
                             step=restored["step"]), step
    restored = mgr.restore(step)
    mgr.close()
    if state is None:
        return restored, step
    params, _ = merge_matching(state.params, restored["params"])
    model_state, _ = merge_matching(state.model_state,
                                    restored["model_state"])
    return state.replace(params=params, model_state=model_state), step


# ---------------------------------------------------------------------------
# torch -> flax converters (take {name: np.ndarray})
# ---------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch (Cout,Cin,kh,kw) -> flax (kh,kw,Cin,Cout)."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Iterable[str], value) -> None:
    d = tree
    *parents, leaf = path
    for p in parents:
        d = d.setdefault(p, {})
    d[leaf] = np.asarray(value)


def convert_torchvision_resnet50(sd: Mapping[str, np.ndarray],
                                 prefix: str = ""
                                 ) -> Tuple[dict, dict]:
    """torchvision/reference ResNet-50 state dict -> (params, constants)
    trees matching ``models/backbone_resnet.ResNet50``.

    Accepts either torchvision names (``layer1.0.conv1.weight``) or the
    reference's ``backbone.0.body.``-prefixed ones.
    """
    params: dict = {}
    consts: dict = {}
    bn_parts = ("weight", "bias", "running_mean", "running_var")
    for name, w in sd.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        if "num_batches_tracked" in name:
            continue
        parts = name.split(".")
        if parts[0] in ("conv1", "bn1"):
            if parts[0] == "conv1":
                _set(params, ("conv1", "kernel"), _conv_w(w))
            else:
                _set(consts, ("bn1", parts[1]), w)
            continue
        m = re.match(r"layer(\d)", parts[0])
        if not m:
            continue
        block = f"block_{parts[1]}"
        mod = parts[2]
        if mod == "downsample":
            which = "downsample_conv" if parts[3] == "0" else "downsample_bn"
            leaf = parts[4]
            if which == "downsample_conv":
                _set(params, (parts[0], block, which, "kernel"), _conv_w(w))
            else:
                assert leaf in bn_parts, name
                _set(consts, (parts[0], block, which, leaf), w)
        elif mod.startswith("conv"):
            _set(params, (parts[0], block, mod, "kernel"), _conv_w(w))
        elif mod.startswith("bn"):
            assert parts[3] in bn_parts, name
            _set(consts, (parts[0], block, mod, parts[3]), w)
    return params, consts


# reference stem module indices (``dformer_backbone.py:34-41``:
# Sequential(conv, bn, GELU, conv, bn)) -> our flat names
_DFORMER_STEM = {"0.0": "stem_conv1", "0.1": "stem_bn1",
                 "0.3": "stem_conv2", "0.4": "stem_bn2"}


def _dformer_flat_name(name: str):
    """Map a DFormer-pretrain key (``downsample_layers_e.i.j.leaf``) onto
    our flat ``stem_conv1.weight`` scheme; passthrough for already-flat
    names; None for keys the reference skips (BN running stats,
    ``dformer_backbone.py:183-189``) or foreign modules."""
    if "downsample_layers_e" not in name:
        return name
    tail = name.split("downsample_layers_e.", 1)[1]
    parts = tail.split(".")
    if len(parts) < 3:
        return None
    leaf = ".".join(parts[2:])
    if leaf in ("running_mean", "running_var", "num_batches_tracked"):
        return None
    mod = _DFORMER_STEM.get(f"{parts[0]}.{parts[1]}")
    if mod is None:
        # stage blocks: Sequential(bn, conv) (``dformer_backbone.py:44-49``)
        mod = (f"stage{parts[0]}_bn" if parts[1] == "0"
               else f"stage{parts[0]}_conv")
    return f"{mod}.{leaf}"


def convert_dformer_downsample_path(sd: Mapping[str, np.ndarray]
                                    ) -> Tuple[dict, dict]:
    """DFormer checkpoint's depth ``downsample_path`` -> (params,
    batch_stats) for ``DFormerDownsamplePath``.

    Reference selective loading (``dformer_backbone.py:161-198``): the depth
    stem convs/BNs come from the DFormer pretrain; names there follow
    ``downsample_layers_e.{i}...`` (mapped via ``_dformer_flat_name``,
    running stats skipped like the reference). Flat
    ``{stem_conv1.weight,..}`` style from our exporter is also accepted;
    unknown keys are ignored.
    """
    sd = {fn: w for name, w in sd.items()
          if (fn := _dformer_flat_name(name)) is not None}
    params: dict = {}
    stats: dict = {}
    for name, w in sd.items():
        parts = name.split(".")
        mod, leaf = parts[0], parts[-1]
        if "conv" in mod:
            if leaf == "weight":
                _set(params, (mod, "kernel"), _conv_w(w))
            else:
                _set(params, (mod, "bias"), w)
        elif "bn" in mod:
            if leaf in ("weight", "scale"):
                _set(params, (mod, "scale"), w)
            elif leaf == "bias":
                _set(params, (mod, "bias"), w)
            elif leaf == "running_mean":
                _set(stats, (mod, "mean"), w)
            elif leaf == "running_var":
                _set(stats, (mod, "var"), w)
    return params, stats
