"""Inference CLI / API.

Parity target: ``inference.py`` — class wrapper that builds the model,
loads weights (+ optional spatial overlay), accepts a single image, a
folder, or a COCO json (with optional paired depth folder and video
ref-clip construction), preprocesses with the eval transform (short side
600 / max 1333), thresholds on the hand-class probability (``--keep_prob``,
softmax over logits, class 1, ``inference.py:918-922``) and writes overlay
PNGs + YOLO-style txt lines ``Hand cx cy w h prob`` normalized to the
original size (``:948-956``). Programmatic entry: ``run_inference(...)``
(``:1169-1217``).
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dfvod_tpu.cli.flags import config_from_args, get_args_parser
from dfvod_tpu.data.dataset import (
    CocoDetectionDataset,
    CocoVideoDataset,
    load_depth,
)
from dfvod_tpu.data.transforms import (
    EvalTransform,
    Sample,
    bucket_shape,
    normalize_and_pad,
)
from dfvod_tpu.models import build_model
from dfvod_tpu.utils import checkpoint as ckpt
from dfvod_tpu.utils.box_ops import box_cxcywh_to_xyxy


class DeformableDETRInference:
    """``inference.py:355`` equivalent.

    ``mesh``: optional ``jax.sharding.Mesh`` for multi-chip serving —
    the clip's frame rows shard over the ``('clip', 'data')`` axes
    (params replicated, XLA inserts the temporal-head collectives over
    ICI), the BASELINE.json north star's clip-parallel inference. The
    frame-batch size must divide the mesh size.
    """

    def __init__(self, cfg, resume: str = "", spatial_weights: str = "",
                 keep_prob: float = 0.5, mesh=None):
        from dfvod_tpu.utils.jax_cache import enable_persistent_cache
        enable_persistent_cache()
        self.cfg = cfg
        self.keep_prob = keep_prob
        self.model, _, _ = build_model(cfg)
        self.transform = EvalTransform(short_side=cfg.data.eval_short_side,
                                       max_size=cfg.data.max_size)
        self.frames = (1 + cfg.model.num_ref_frames
                       if cfg.model.temporal_mode != "none" else 1)
        self.variables = None
        fn = lambda v, x, m: (lambda o: (  # noqa: E731
            o["pred_logits"], o["pred_boxes"]))(
            self.model.apply(v, x, m, train=False))
        if mesh is None:
            self._fwd = jax.jit(fn)
        else:
            from dfvod_tpu.parallel import clip_batch_sharding, replicated
            repl = replicated(mesh)
            self._fwd = jax.jit(
                fn,
                in_shardings=(repl, clip_batch_sharding(mesh, 4),
                              clip_batch_sharding(mesh, 3)),
                out_shardings=(repl, repl))
        self.mesh = mesh
        self._resume = resume
        self._spatial = spatial_weights

    def _init_variables(self, images, mask):
        variables = jax.jit(lambda r: self.model.init(
            r, images, mask, train=False))(jax.random.PRNGKey(0))
        params = variables["params"]
        if self._resume and self._resume.endswith((".pth", ".pth.tar")):
            # reference torch checkpoint, converted on the fly
            from dfvod_tpu.utils.convert_reference import (
                load_reference_checkpoint,
            )
            variables, _ = load_reference_checkpoint(
                self._resume, variables,
                with_box_refine=self.cfg.model.with_box_refine)
            params = variables["params"]
        elif self._resume:
            restored, _ = ckpt.load_checkpoint(self._resume)
            params, _ = ckpt.merge_matching(params, restored["params"])
            for coll, tree in restored.get("model_state", {}).items():
                if coll in variables:
                    merged, _ = ckpt.merge_matching(variables[coll], tree)
                    variables = {**variables, coll: merged}
        if self._spatial:  # overlay (``inference.py:812-815``)
            restored, _ = ckpt.load_checkpoint(self._spatial)
            params = ckpt.merge_temporal_weights(
                params, spatial_params=restored["params"])
        variables = {**variables, "params": params}
        if self.cfg.model.compute_dtype == "bfloat16":
            # serving mode: bf16 weights + activations
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, variables)
        self.variables = variables

    def _prep(self, frames: List[Sample]):
        frames = self.transform(frames)
        hs = max(f.rgb.shape[0] for f in frames)
        ws = max(f.rgb.shape[1] for f in frames)
        pad = bucket_shape(hs, ws)
        cols = [normalize_and_pad(f, pad, self.cfg.data.use_depth,
                                  max_boxes=1) for f in frames]
        images = jnp.asarray(np.stack([c["image"] for c in cols]))
        mask = jnp.asarray(np.stack([c["mask"] for c in cols]))
        return images, mask

    def infer_frames(self, frames: List[Sample]) -> Dict:
        """One clip (or single frame) -> detections on the key frame."""
        images, mask = self._prep(frames)
        if self.cfg.model.compute_dtype == "bfloat16":
            images = images.astype(jnp.bfloat16)
        if self.variables is None:
            self._init_variables(images, mask)
        logits, boxes = self._fwd(self.variables, images, mask)
        logits = np.asarray(logits[0], dtype=np.float32)
        boxes = np.asarray(boxes[0], dtype=np.float32)
        # softmax + hand-class (1) threshold (``inference.py:918-922``)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        keep = probs[:, 1] > self.keep_prob
        return {"boxes_cxcywh": boxes[keep], "probs": probs[keep, 1],
                "orig_size": frames[0].orig_size,
                "image_id": frames[0].image_id}


def save_yolo_txt(dets: Dict, path: str, class_name: str = "Hand"):
    """YOLO-style output lines (``inference.py:948-956``)."""
    lines = [f"{class_name} {b[0]:.6f} {b[1]:.6f} {b[2]:.6f} {b[3]:.6f} "
             f"{p:.6f}" for b, p in zip(dets["boxes_cxcywh"], dets["probs"])]
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def save_overlay(dets: Dict, rgb: np.ndarray, path: str):
    """Box overlay PNG (``plot_results``, ``inference.py:491``) — PIL
    drawing instead of matplotlib to stay dependency-light."""
    from PIL import ImageDraw
    img = Image.fromarray(rgb).convert("RGB")
    draw = ImageDraw.Draw(img)
    h, w = dets["orig_size"]
    for b, p in zip(dets["boxes_cxcywh"], dets["probs"]):
        xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(b))) * \
            np.array([w, h, w, h])
        draw.rectangle(xyxy.tolist(), outline=(255, 0, 0), width=3)
        draw.text((float(xyxy[0]), max(float(xyxy[1]) - 12, 0)),
                  f"{p:.2f}", fill=(255, 0, 0))
    img.save(path)


def _frame_from_files(img_path: str, depth_path: Optional[str]) -> Sample:
    rgb = np.asarray(Image.open(img_path).convert("RGB"))
    depth = load_depth(depth_path) if depth_path else None
    return Sample(rgb=rgb, depth=depth, boxes=np.zeros((0, 4), np.float32),
                  labels=np.zeros((0,), np.int64),
                  orig_size=rgb.shape[:2])


def run_inference(*, resume: str = "", img_path: str = "",
                  img_folder: str = "", depth_folder: str = "",
                  inference_coco_path: str = "", coco_img_folder: str = "",
                  output_dir: str = "out", keep_prob: float = 0.5,
                  save_txt: bool = True, save_img: bool = True,
                  spatial_weights: str = "", cfg=None,
                  num_devices: int = 0, **cfg_kw) -> List:
    """Programmatic API (``inference.py:1169-1217``).

    ``num_devices`` > 1: clip-parallel serving over a ``('clip','data')``
    mesh of that many local devices (frame rows must divide it)."""
    from dfvod_tpu.utils.config import Config
    cfg = cfg or Config.from_flat(**cfg_kw)
    mesh = None
    if num_devices > 1:
        import jax as _jax
        from dfvod_tpu.parallel import make_mesh
        frames = (1 + cfg.model.num_ref_frames
                  if cfg.model.temporal_mode != "none" else 1)
        clip = frames if num_devices % frames == 0 else 1
        mesh = make_mesh(_jax.devices()[:num_devices], clip=clip)
    engine = DeformableDETRInference(cfg, resume=resume,
                                     spatial_weights=spatial_weights,
                                     keep_prob=keep_prob, mesh=mesh)
    os.makedirs(output_dir, exist_ok=True)

    jobs = []  # (name, List[Sample])
    if inference_coco_path:
        ds_cls = (CocoVideoDataset if engine.frames > 1
                  else CocoDetectionDataset)
        kw = dict(use_depth=cfg.data.use_depth, train=False,
                  depth_folder=depth_folder or None)
        if engine.frames > 1:
            kw["num_ref_frames"] = cfg.model.num_ref_frames
        ds = ds_cls(coco_img_folder, inference_coco_path, **kw)
        for i in range(len(ds)):
            clip = ds[i]
            jobs.append((f"img_{clip[0].image_id}", clip))
    else:
        paths = ([img_path] if img_path else
                 sorted(os.path.join(img_folder, f)
                        for f in os.listdir(img_folder)
                        if f.lower().endswith((".jpg", ".png", ".jpeg"))))
        for p in paths:
            dp = (os.path.join(depth_folder, os.path.basename(p))
                  if depth_folder else None)
            frame = _frame_from_files(p, dp)
            jobs.append((os.path.splitext(os.path.basename(p))[0],
                         [frame] * engine.frames))

    results = []
    for name, clip in jobs:
        dets = engine.infer_frames(clip)
        results.append(dets)
        if save_txt:
            save_yolo_txt(dets, os.path.join(output_dir, f"{name}.txt"))
        if save_img:
            save_overlay(dets, clip[0].rgb,
                         os.path.join(output_dir, f"{name}.png"))
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(
        "dfvod_tpu inference", parents=[get_args_parser(video=True)])
    parser.add_argument("--img_path", default="", type=str)
    parser.add_argument("--img_folder", default="", type=str)
    parser.add_argument("--depth_folder", default="", type=str)
    parser.add_argument("--inference_coco_path", default="", type=str)
    parser.add_argument("--coco_img_folder", default="", type=str)
    parser.add_argument("--keep_prob", default=0.5, type=float)
    parser.add_argument("--save_txt", action="store_true", default=True)
    parser.add_argument("--no_save_img", dest="save_img",
                        action="store_false", default=True)
    args = parser.parse_args(argv)
    cfg = config_from_args(args, video=bool(args.num_ref_frames)
                           and "multi" in args.dataset_file)
    run_inference(
        cfg=cfg, resume=args.resume, img_path=args.img_path,
        img_folder=args.img_folder, depth_folder=args.depth_folder,
        inference_coco_path=args.inference_coco_path,
        coco_img_folder=args.coco_img_folder,
        output_dir=args.output_dir or "out", keep_prob=args.keep_prob,
        save_txt=args.save_txt, save_img=args.save_img,
        spatial_weights=args.spatial_weights,
        num_devices=args.num_devices)


if __name__ == "__main__":
    main()
