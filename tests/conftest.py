"""Test configuration: force an 8-device virtual CPU mesh.

This mirrors how multi-chip sharding is validated without TPU hardware
(SURVEY.md §4: test pyramid item (d)). The axon TPU plugin registers itself
at interpreter startup and overrides JAX_PLATFORMS, so we force the platform
back to CPU via jax.config *after* import (backends initialize lazily).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the tiny-config train step takes minutes to
# compile on CPU; cache hits make reruns fast.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
