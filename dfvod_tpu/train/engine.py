"""Train/eval steps — the jitted core of ``engine_single.py`` /
``engine_multi.py``.

One ``train_step`` is a single XLA program: forward -> criterion (with the
on-device LAPJV Hungarian matcher, so no per-step host round-trip — the
reference syncs GPU->CPU at scipy every step, ``matcher.py:95-99``) ->
grads -> global clip -> per-group AdamW update. Batches arrive sharded over
the mesh's ``data`` axis; parameters are replicated, so XLA inserts the
gradient all-reduce that DDP performed with NCCL (``main.py:439-443``).

The NaN hard-exit (``engine_single.py:56-59``) lives in the host epoch loop
(``dfvod_tpu/cli/main.py``), where the loss scalar is already needed for
logging.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfvod_tpu.train.optim import build_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any        # trainable ("params" collection)
    model_state: Any   # non-trainable: FrozenBN "constants", DFormer
                       # "batch_stats" (running stats updated in training)
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, **self.model_state}


def create_train_state(rng, model, cfg, sample_batch,
                       steps_per_epoch: int = 1000):
    """Initialize params + optimizer. Returns (state, tx, labels)."""
    images = sample_batch["images"]
    if images.dtype == jnp.uint8:
        from dfvod_tpu.data.device_pipeline import device_normalize
        images, mask = device_normalize(images, sample_batch["sizes"])
    else:
        mask = sample_batch["mask"]
    init = jax.jit(lambda r, x, m: model.init(r, x, m, train=False))
    variables = init(rng, images, mask)
    variables = dict(variables)
    params = variables.pop("params")
    tx, labels = build_optimizer(params, cfg.model, cfg.train,
                                 steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       model_state=variables, opt_state=tx.init(params))
    return state, tx, labels


def make_train_step(model, criterion, tx, mesh: Optional[Mesh] = None,
                    donate: bool = True, frames: int = 1,
                    train_dtype: str = "float32", labels=None):
    """Build the jitted train step.

    batch: dict with images (B,H,W,C), mask (B,H,W) bool,
    labels (B,T) int32, boxes (B,T,4) cxcywh in [0,1], valid (B,T) bool.

    ``frames`` > 1 (video): the batch carries B = clips * frames frame
    rows; the model outputs key-frame predictions only, so targets are
    sliced to the key frame of each clip (the reference's dataset returns
    only key-frame targets, ``vid_multi.py:46-168``).

    ``train_dtype='bfloat16'``: mixed-precision training — master params,
    optimizer state and the criterion stay f32; params + images are cast
    to bf16 inside ``loss_fn``, so forward activations (and the MSDA /
    RoIAlign Pallas hat kernels, which gate on bf16 values) run bf16;
    the cast's transpose returns f32 cotangents to the master params.
    Mutable batch_stats are kept f32 (flax computes train-mode BN stats
    from the batch itself, so they never enter forward math).

    ``labels``: the optimizer label tree from ``build_optimizer``. When
    given, parameters labeled "frozen" are ``stop_gradient``-ed inside
    ``loss_fn`` — the exact semantics of the reference's
    ``requires_grad=False`` freezing (``main.py:311-421``): their
    backward chain is never traced (XLA skips, e.g., the whole RGB
    backbone backward in LateFusion/Encoder-CF training: 147.5 -> 117.8
    ms/step at B=8, LateFusion bf16), their gradients are exact zeros, and — matching
    ``clip_grad_norm_`` over torch params whose ``.grad`` is None —
    they no longer contribute to the global clip norm. Without
    ``labels`` the old compute-then-zero behavior is kept.
    """

    def key_frames(x):
        if frames == 1:
            return x
        return x.reshape(x.shape[0] // frames, frames, *x.shape[1:])[:, 0]

    bf16_train = train_dtype == "bfloat16"

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree)

    def step_fn(state: TrainState, batch: Dict, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        has_bn = "batch_stats" in state.model_state
        # on-device preprocessing path: uint8 frames + content sizes
        # (``data/device_pipeline.py``) — normalization fuses into the
        # model graph
        from dfvod_tpu.data.device_pipeline import maybe_device_normalize
        images, mask = maybe_device_normalize(
            batch["images"],
            batch["sizes"] if batch["images"].dtype == jnp.uint8
            else batch["mask"])

        model_state = state.model_state
        if bf16_train:
            images = images.astype(jnp.bfloat16)
            # FrozenBN "constants" are never updated -> safe to cast;
            # "batch_stats" are updated (running stats) -> keep f32
            model_state = {k: (to_bf16(v) if k != "batch_stats" else v)
                           for k, v in model_state.items()}

        def loss_fn(params):
            if labels is not None:
                params = jax.tree_util.tree_map(
                    lambda p, l: (jax.lax.stop_gradient(p)
                                  if l == "frozen" else p),
                    params, labels)
            if bf16_train:
                params = to_bf16(params)
            variables = {"params": params, **model_state}
            if has_bn:
                out, mut = model.apply(
                    variables, images, mask, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
            else:
                out = model.apply(variables, images, mask,
                                  train=True, rngs={"dropout": rng})
                mut = {}
            targets = {"labels": key_frames(batch["labels"]),
                       "boxes": key_frames(batch["boxes"]),
                       "valid": key_frames(batch["valid"])}
            if "masks" in batch:  # --masks seg training targets
                targets["masks"] = key_frames(batch["masks"])
            if bf16_train:  # criterion (matcher/focal/giou) stays f32
                out = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if getattr(x, "dtype", None) == jnp.bfloat16 else x,
                    out)
            total, parts = criterion(out, targets)
            return total, (parts, mut)

        (loss, (parts, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype),
            state.params, updates)
        mut = jax.tree_util.tree_map(jax.lax.stop_gradient, mut)
        if bf16_train:  # running stats live f32 across steps
            mut = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16 else x, mut)
        model_state = {**state.model_state, **mut}
        new_state = TrainState(step=state.step + 1, params=params,
                               model_state=model_state, opt_state=opt_state)
        metrics = {"loss": loss,
                   "grad_norm": optax_global_norm(grads)}
        metrics.update({k: v for k, v in parts.items()})
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def batch_shardings(batch):
        # honor the sharding the loader committed (plain DP or
        # clip-parallel P(('clip','data'))); host arrays default to DP
        return {k: (v.sharding if hasattr(v, "sharding") and
                    getattr(v.sharding, "mesh", None) is not None
                    else NamedSharding(
                        mesh, P("data", *([None] * (v.ndim - 1)))))
                for k, v in batch.items()}

    # one jit wrapper per sharding signature, built once and cached (a
    # fresh jax.jit per step would pay wrapper construction + the slow
    # dispatch path every iteration)
    cache = {}

    def jitted(state, batch, rng):
        in_sh = (repl, batch_shardings(batch), repl)
        key = tuple(sorted((k, str(s)) for k, s in in_sh[1].items()))
        f = cache.get(key)
        if f is None:
            f = jax.jit(step_fn, in_shardings=in_sh,
                        out_shardings=(repl, repl),
                        donate_argnums=(0,) if donate else ())
            cache[key] = f
        return f(state, batch, rng)

    return jitted


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


_EVAL_STEP_MEMO = {}


def make_eval_step(model):
    """Jitted forward returning (pred_logits, pred_boxes); accepts f32
    images + mask or uint8 images + sizes (on-device preprocess, see
    ``data/device_pipeline.py``). Host side finishes with ``postprocess``
    + COCO accumulation (``engine_single.py:81-165``); sharded batches
    keep their committed shardings through jit. Memoized per model
    instance so repeated ``evaluate()`` calls (and the CLI's startup
    eval-shape warm-up) reuse one jitted program instead of retracing."""
    memo = _EVAL_STEP_MEMO.get(id(model))
    if memo is not None and memo[0] is model:
        return memo[1]

    def fwd(variables, images, mask_or_sizes):
        from dfvod_tpu.data.device_pipeline import maybe_device_normalize
        images, mask = maybe_device_normalize(images, mask_or_sizes)
        out = model.apply(variables, images, mask, train=False)
        return out["pred_logits"], out["pred_boxes"]

    jitted = jax.jit(fwd)
    _EVAL_STEP_MEMO[id(model)] = (model, jitted)
    return jitted
