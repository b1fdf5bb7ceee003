"""Training CLI — single-frame models (Baseline + 3 fusion modes).

Parity target: ``main.py:196-655`` — seeding, model/dataset/loader build,
per-fusion optimizer groups, epoch loop with per-epoch cosine step,
checkpoint every epoch (numbered every 5), NaN hard-exit, eval, logging.
Distributed init is implicit: one process drives all local devices via the
mesh (replaces ``init_distributed_mode`` + DDP).
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

from dfvod_tpu.cli.flags import config_from_args, get_args_parser
from dfvod_tpu.data.dataset import build_dataset, make_transform
from dfvod_tpu.data.loader import Loader
from dfvod_tpu.models import build_model
from dfvod_tpu.parallel import make_mesh
from dfvod_tpu.train import create_train_state, make_train_step
from dfvod_tpu.train.evaluate import evaluate
from dfvod_tpu.utils import checkpoint as ckpt
from dfvod_tpu.utils.logging import (
    MetricLogger,
    WandbLogger,
    append_log,
    dump_args,
    setup_for_distributed,
)

# Deliberate NaN-divergence hard-exit code. The reference uses
# ``sys.exit(1)`` (``engine_single.py:56-59``), but rc=1 is also what any
# unhandled Python exception produces; a distinct code lets run
# supervisors retry transient crashes while aborting only on divergence.
NAN_EXIT_CODE = 42


def maybe_init_distributed():
    """``init_distributed_mode`` parity (``util/misc.py:441-479``): the
    reference spawns one NCCL process per GPU from env vars; on TPU one
    process drives all local chips, and multi-HOST pods additionally need
    the JAX distributed runtime. Initialize it when a coordinator is
    configured (TPU pod metadata or explicit env); single-host runs are
    untouched."""
    import os
    if jax.process_count() > 1:
        return  # already initialized
    if (os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("DFVOD_MULTIHOST")):
        try:
            jax.distributed.initialize()
        except Exception as e:  # pragma: no cover - depends on env
            print(f"[dist] jax.distributed.initialize failed: {e}")


def train_loop(cfg, *, video: bool = False, resume: str = "",
               start_epoch: int = 0, eval_only: bool = False,
               del_class_weights: bool = False,
               temporal_weights: str = "", spatial_weights: str = "",
               wandb_enabled: bool = False, auto_resume: bool = False):
    from dfvod_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    np.random.seed(cfg.train.seed)
    if cfg.model.frozen_weights:
        # ``main.py:223``: seg-only training mode
        assert cfg.model.masks, \
            "Frozen training is meant for segmentation only"
    maybe_init_distributed()
    setup_for_distributed(jax.process_index() == 0)
    devices = (jax.devices()[:cfg.train.num_devices]
               if cfg.train.num_devices else None)
    mesh = make_mesh(devices)
    n_dev = len(mesh.devices.flatten())
    frames = (1 + cfg.model.num_ref_frames) if video else 1
    print(f"devices: {n_dev} ({mesh.devices.flatten()[0].platform}), "
          f"frames/clip: {frames}")

    model, criterion, _ = build_model(cfg)
    dump_args(cfg, cfg.output_dir)

    train_ds = build_dataset("train", cfg, temporal=video)
    val_ds = build_dataset("val", cfg, temporal=video)
    # multi-host: each process loads its contiguous shard
    # (``datasets/samplers.py:48-66`` semantics; jax runtime = rendezvous)
    common = dict(max_boxes=cfg.data.max_boxes, use_depth=cfg.data.use_depth,
                  seed=cfg.train.seed, mesh=mesh,
                  device_preprocess=cfg.data.device_preprocess,
                  pack_s2d=cfg.data.pack_s2d,
                  num_workers=cfg.data.num_workers,
                  rank=jax.process_index(), world=jax.process_count())
    train_loader = Loader(train_ds, make_transform(True, cfg),
                          batch_size=cfg.train.batch_size, shuffle=True,
                          drop_last=True, **common)
    val_loader = Loader(val_ds, make_transform(False, cfg),
                        batch_size=cfg.train.batch_size, shuffle=False,
                        **common)
    steps_per_epoch = max(len(train_loader), 1)

    def to_batch(sample):
        batch = {"images": sample["image"], "labels": sample["labels"],
                 "boxes": sample["boxes"], "valid": sample["valid"]}
        if "mask" in sample:
            batch["mask"] = sample["mask"]
        else:  # device-preprocess path: uint8 + sizes
            batch["sizes"] = sample["size"]
        if "masks" in sample:  # --masks seg training targets
            batch["masks"] = sample["masks"]
        return batch

    batch = to_batch(train_loader.first_batch())
    state, tx, labels = create_train_state(
        jax.random.PRNGKey(cfg.train.seed), model, cfg, batch,
        steps_per_epoch)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(state.params))
    print(f"number of params: {int(n_params)}")

    # ---- checkpoint surgery + resume (``main.py:468-540``,
    # ``main_multi.py:342-364``); ``.pth`` files are reference torch
    # checkpoints, converted on the fly
    if resume and resume.endswith((".pth", ".pth.tar")):
        from dfvod_tpu.utils.convert_reference import (
            load_reference_checkpoint,
        )
        variables, _ = load_reference_checkpoint(
            resume, state.variables,
            with_box_refine=cfg.model.with_box_refine)
        if del_class_weights:
            variables["params"] = ckpt.drop_keys(
                variables["params"], "class_embed")
            variables["params"], _ = ckpt.merge_matching(
                state.params, variables["params"])
        state = state.replace(
            params=variables["params"],
            model_state={k: v for k, v in variables.items()
                         if k != "params"})
        resume = ""
    if resume:
        restored, _ = ckpt.load_checkpoint(resume)
        weights = restored["params"]
        if del_class_weights:
            weights = ckpt.drop_keys(weights, "class_embed")
        params, _ = ckpt.merge_matching(state.params, weights)
        model_state, _ = ckpt.merge_matching(state.model_state,
                                             restored.get("model_state", {}))
        state = state.replace(params=params, model_state=model_state)
    if cfg.model.frozen_weights:
        # load the detector checkpoint under the mask branch
        # (``main.py:452-453``: model.detr.load_state_dict(ckpt['model']));
        # the optimizer labels every non-mask_branch param "frozen"
        # (``train/optim.py``), matching DETRsegm's freeze_detr
        if cfg.model.frozen_weights.endswith((".pth", ".pth.tar")):
            from dfvod_tpu.utils.convert_reference import (
                load_reference_checkpoint,
            )
            variables, _ = load_reference_checkpoint(
                cfg.model.frozen_weights, state.variables,
                with_box_refine=cfg.model.with_box_refine)
            weights = variables["params"]
        else:
            weights = ckpt.load_checkpoint(
                cfg.model.frozen_weights)[0]["params"]
        weights = ckpt.drop_keys(weights, "mask_branch")
        params, _ = ckpt.merge_matching(state.params, weights)
        state = state.replace(params=params)
    if temporal_weights or spatial_weights:
        t = (ckpt.load_checkpoint(temporal_weights)[0]["params"]
             if temporal_weights else None)
        s = (ckpt.load_checkpoint(spatial_weights)[0]["params"]
             if spatial_weights else None)
        state = state.replace(params=ckpt.merge_temporal_weights(
            state.params, temporal_params=t, spatial_params=s))
    if getattr(cfg.model, "dformer_weights", ""):
        # selective DFormer-pretrain load into the depth stem
        # (``dformer_backbone.py:161-198``; BN running stats skipped like
        # the reference)
        from dfvod_tpu.utils.convert_reference import load_torch_state_dict
        dparams, _ = ckpt.convert_dformer_downsample_path(
            load_torch_state_dict(cfg.model.dformer_weights))
        overlay = ({"backbone": dparams}
                   if cfg.model.fusion_type == "Backbone_CrossFusion"
                   else {"depth_backbone": {"downsample_path": dparams}})
        params, _ = ckpt.merge_matching(state.params, overlay)
        state = state.replace(params=params)

    # ---- auto-resume (durability, not reference parity): pick up a run
    # killed mid-flight by the supervisor — full state incl. optimizer and
    # epoch, plus the best-mAP watermark so a worse post-restart eval
    # cannot overwrite ``best/``
    import json
    import os
    best_meta_path = os.path.join(cfg.output_dir or ".", "best_meta.json")
    resumed_best = -1.0
    if auto_resume and cfg.output_dir:
        try:
            state, last_epoch = ckpt.load_checkpoint(
                cfg.output_dir, state, weights_only=False)
            start_epoch = max(start_epoch, last_epoch + 1)
            print(f"auto-resume: epoch {last_epoch} restored, "
                  f"continuing at {start_epoch}")
        except FileNotFoundError:
            print("auto-resume: no checkpoint yet, fresh start")
        if os.path.exists(best_meta_path):
            with open(best_meta_path) as f:
                resumed_best = json.load(f).get("best_map50", -1.0)
            print(f"auto-resume: best mAP_50 watermark {resumed_best:.4f}")

    if eval_only:
        stats = evaluate(model, state.variables, val_loader, val_ds.coco,
                         frames=frames)
        append_log(cfg.output_dir, {"eval": stats})
        return stats

    step_fn = make_train_step(model, criterion, tx, mesh=mesh,
                              frames=frames,
                              train_dtype=cfg.train.train_dtype,
                              labels=labels)
    wandb = WandbLogger(wandb_enabled, config={"cfg": str(cfg)})
    rng = jax.random.PRNGKey(cfg.train.seed + 1)

    # Background liveness heartbeat: a single XLA compile longer than a
    # supervisor's --stall window produces zero output while in flight
    # (the post-step print at the bottom of the loop lands only after the
    # step returns), which is exactly how round 4's joint-OID launch was
    # stall-killed mid-compile. A daemon thread prints every 2 min while
    # no foreground progress line has landed, so stall detectors see
    # liveness through arbitrarily long compiles.
    import threading
    hb = {"t": time.time(), "msg": "startup"}

    def _heartbeat():
        while True:
            time.sleep(120)
            dt = time.time() - hb["t"]
            if dt > 90:
                print(f"[heartbeat] alive: {hb['msg']} in flight "
                      f"{dt:.0f}s (likely XLA compile)", flush=True)
    threading.Thread(target=_heartbeat, daemon=True).start()

    # warm the eval-shape program before the epoch loop so the first
    # --eval_every eval doesn't pay a mid-run XLA compile (round-3 logs:
    # 37.0s first eval batch vs 2.6s steady state). One forward on the
    # first val batch compiles + persists the program; evaluate() reuses
    # the same memoized jitted step.
    if cfg.train.eval_every and cfg.train.epochs - start_epoch > 1:
        from dfvod_tpu.train.engine import make_eval_step
        wb = val_loader.first_batch()
        tw = time.time()
        hb["t"], hb["msg"] = tw, "eval-shape warm-up"
        fwd = make_eval_step(model)
        jax.block_until_ready(fwd(
            state.variables, wb["image"],
            wb["mask"] if "mask" in wb else wb["size"]))
        print(f"eval-shape warm-up: {time.time() - tw:.1f}s")

    print("Start training")
    t0 = time.time()
    best_map50 = resumed_best
    profile_dir = getattr(cfg.train, "profile_dir", "")
    profiling = False
    step_idx = 0
    # skip compile steps when the run is long enough to afford it
    profile_start = 2 if steps_per_epoch > 2 else 0
    for epoch in range(start_epoch, cfg.train.epochs):
        train_loader.set_epoch(epoch)
        logger = MetricLogger(print_freq=10)
        for sample in logger.log_every(train_loader,
                                       header=f"Epoch: [{epoch}]"):
            # trace ~10 post-compile steps into --profile_dir
            if profile_dir and step_idx == profile_start and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and step_idx == profile_start + 10:
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile written to {profile_dir}")
            step_idx += 1
            t_step = time.time()
            hb["t"] = t_step
            hb["msg"] = f"train step {step_idx - 1} (epoch {epoch})"
            state, metrics = step_fn(state, to_batch(sample), rng)
            hb["t"] = time.time()
            loss = float(metrics["loss"])
            if time.time() - t_step > 60:
                # compile-heavy step: emit a line so stall-detecting
                # supervisors (scripts/supervise.py) see liveness — a
                # cold multi-bucket start can otherwise go >15 min
                # between MetricLogger prints and be killed mid-compile
                print(f"step {step_idx - 1}: {time.time() - t_step:.0f}s "
                      "(XLA compile)", flush=True)
            if not np.isfinite(loss):
                # NaN hard-exit (``engine_single.py:56-59``). Exit code
                # 42 is deliberately distinct from the generic rc=1 any
                # unhandled Python exception produces, so supervisors
                # (scripts/supervise.py) can retry crashes while treating
                # genuine divergence as fatal (round-4 postmortem: a
                # FileNotFoundError was misread as NaN and not retried).
                print(f"Loss is {loss}, stopping training")
                print({k: float(v) for k, v in metrics.items()})
                sys.exit(NAN_EXIT_CODE)
            logger.update(loss=loss,
                          grad_norm=float(metrics["grad_norm"]),
                          loss_ce=float(metrics.get("loss_ce", 0.0)),
                          loss_bbox=float(metrics.get("loss_bbox", 0.0)),
                          loss_giou=float(metrics.get("loss_giou", 0.0)))

        if cfg.output_dir:
            ckpt.save_checkpoint(cfg.output_dir, state, epoch)
        stats = {"epoch": epoch,
                 **{f"train_{k}": m.global_avg
                    for k, m in logger.meters.items()}}
        # periodic eval + best-checkpoint tracking (the reference
        # evaluates every epoch, ``main.py:587-600``)
        ev = cfg.train.eval_every
        if ev and ((epoch + 1) % ev == 0 or epoch + 1 == cfg.train.epochs):
            hb["t"], hb["msg"] = time.time(), f"eval after epoch {epoch}"
            val_stats = evaluate(model, state.variables, val_loader,
                                 val_ds.coco, frames=frames)
            hb["t"] = time.time()
            stats.update({f"test_{k}": v for k, v in val_stats.items()})
            if val_stats.get("mAP_50", 0.0) > best_map50:
                best_map50 = val_stats["mAP_50"]
                if cfg.output_dir:
                    ckpt.save_checkpoint(
                        os.path.join(cfg.output_dir, "best"), state, epoch)
                    with open(best_meta_path, "w") as f:
                        json.dump({"best_map50": best_map50,
                                   "epoch": epoch}, f)
                print(f"new best mAP_50={best_map50:.4f} @ epoch {epoch}")
        append_log(cfg.output_dir, stats)
        wandb.log(stats)

    if profiling:  # run ended before step 12
        jax.profiler.stop_trace()
        print(f"profile written to {profile_dir}")
    print(f"Training time {time.time() - t0:.0f}s")
    eval_stats = evaluate(model, state.variables, val_loader, val_ds.coco,
                          frames=frames)
    append_log(cfg.output_dir, {"eval": eval_stats})
    wandb.finish()
    return eval_stats


def main(argv=None, video: bool = False):
    parser = argparse.ArgumentParser(
        "dfvod_tpu training", parents=[get_args_parser(video=video)])
    args = parser.parse_args(argv)
    cfg = config_from_args(args, video=video)
    return train_loop(
        cfg, video=video, resume=args.resume, start_epoch=args.start_epoch,
        eval_only=args.eval, del_class_weights=args.del_class_weights,
        temporal_weights=getattr(args, "transvod_temporal_weights", ""),
        spatial_weights=getattr(args, "spatial_weights", ""),
        wandb_enabled=not args.no_wandb,
        auto_resume=getattr(args, "auto_resume", False))


if __name__ == "__main__":
    main()
