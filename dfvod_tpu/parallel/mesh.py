"""Mesh construction and sharding helpers.

Replaces the reference's process-per-GPU launch (``tools/launch.py``,
``util/misc.py:441-479``): one Python process drives all local devices, and
``jax.jit`` with NamedShardings turns the criterion's global reductions and
the gradient all-reduce into XLA collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              clip: int = 1) -> Mesh:
    """Build a ``('clip', 'data')`` mesh over the given (default: all)
    devices.

    ``clip`` > 1 dedicates that many devices to the clip/frame dimension of
    video inference (TransVOD's 1+N frames ride the batch dim,
    ``deformable_transformer_multi.py:193-378``); the remainder is data
    parallelism. ``clip=1`` degenerates to plain DP, the reference's only
    strategy.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % clip != 0:
        raise ValueError(f"{n} devices not divisible by clip={clip}")
    arr = np.asarray(devices).reshape(clip, n // clip)
    return Mesh(arr, ("clip", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def clip_batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading axis over *both* mesh axes — used for video
    clips where batch = B·(1+num_ref_frames) frames: frames of one clip
    spread over the ``clip`` axis, clips over ``data``."""
    return NamedSharding(mesh, P(("clip", "data"), *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh, clip_parallel: bool = False):
    """device_put a pytree of host arrays with the batch axis sharded."""
    make = clip_batch_sharding if clip_parallel else batch_sharding

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, make(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)
