"""Device mesh + sharding rules — the TPU-native replacement for the
reference's DDP/NCCL layer (``util/misc.py:441-479``, ``tools/launch.py``).

The reference's single parallelism strategy is data parallelism
(SURVEY.md §2.5). Here that becomes a ``jax.sharding.Mesh`` with a
``data`` axis (and an optional ``clip`` axis for clip-parallel video
inference): batches are sharded over the mesh, parameters are replicated,
and XLA inserts the gradient all-reduces that DDP did by hand with NCCL.
Multi-host runs ride the same code path — the JAX runtime maps the mesh
over ICI within a slice and DCN across slices.
"""
from dfvod_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    clip_batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
