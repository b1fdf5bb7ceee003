"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-world answer to "test multi-chip without a cluster"
(SURVEY.md §4): shardings and collectives compile and execute on the
virtual CPU mesh exactly as they would over ICI.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs;
# the config update still applies as long as no backend client exists yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
