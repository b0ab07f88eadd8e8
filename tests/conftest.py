"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Hard override: the image pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and
# its sitecustomize imports jax at interpreter start, latching that env var
# into jax.config. Tests must run on host CPU with 8 virtual devices, so we
# override through jax.config, not the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persist compiled executables across test sessions — XLA compiles dominate
# suite wall-time otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsorb_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
