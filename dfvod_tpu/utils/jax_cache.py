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


def _host_tag() -> str:
    """Short fingerprint of the host's CPU flag set."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return "host-" + hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_persistent_cache(default_dir: str | None = None) -> str:
    cache = os.environ.get("DFVOD_JAX_CACHE")
    if cache == "":
        return ""
    if cache is None:
        cache = default_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "dfvod_jax")
    # XLA:CPU AOT artifacts bake in the *compiling* host's CPU features
    # and can SIGILL after a host swap (cpu_aot_loader warns exactly
    # this when round-3's cache is loaded on the round-4 machine).
    # Shard the directory by a host-ISA fingerprint when this process is
    # CPU-forced (the multichip dryrun and the test suite — the contexts
    # whose red artifacts a SIGILL would cause); TPU runs keep the shared
    # warm cache, whose entries target the device, not the host.
    if (os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
            or "xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")):
        cache = os.path.join(cache, _host_tag())
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover - old jax without the knobs
        return ""
    return cache
