"""Test harness configuration.

Tests run on a virtual 8-device CPU backend so that multi-chip sharding
paths (mesh + shard_map) are exercised without TPU pod hardware. The env
vars must be set before the first jax import anywhere in the process.
"""

import os

import pytest  # noqa: E402
import jax  # noqa: E402

# Force the CPU backend with 8 virtual devices. Note: plain env vars
# (JAX_PLATFORMS / XLA_FLAGS) are overridden by the preregistered TPU
# plugin on this machine, so the config API is the reliable path.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache makes test re-runs dramatically faster.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "jax_impl"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference checkout not available at /root/reference",
)
