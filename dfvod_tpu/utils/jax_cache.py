"""Persistent XLA compilation cache for every CLI entry point.

The training configs compile one program per static resize bucket (plus
eval shapes); cold compiles of the full model take minutes each on the
tunneled TPU. A persistent cache makes repeat runs (seed sweeps,
resume, finetune stages) start in seconds — the reference has no
equivalent concern (torch eager), so this is pure TPU-runtime plumbing.

``DFVOD_JAX_CACHE`` overrides the location; empty string disables.
"""
from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str:
    cache = os.environ.get("DFVOD_JAX_CACHE")
    if cache == "":
        return ""
    if cache is None:
        cache = default_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "dfvod_jax")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover - old jax without the knobs
        return ""
    return cache
