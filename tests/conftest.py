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
# compile on CPU; cache hits make reruns fast. The dir is keyed by the host
# CPU's feature flags + jax version: XLA's cache key does NOT include the
# compile-machine microarch, so a cache carried to a different VM serves AOT
# blobs built for foreign CPU features — observed as cpu_aot_loader
# "prefer-no-scatter not supported on the host machine" warnings, ~2e-5
# numeric skew vs fresh compiles (enough to fail bit-equivalence tests),
# and a documented SIGILL risk.
from tdgp.utils.platform import compilation_cache_dir

# TDGP_TEST_CACHE_DIR overrides the location entirely — the contamination
# diagnostic ("does this failure reproduce against a FRESH cache?").
# TDGP_TEST_NO_CACHE=1 disables the persistent cache: the cache path runs
# XLA:CPU's AOT pipeline, whose codegen numerics differ ~1e-5 from plain
# JIT — scripts/testing/diag_equiv_noise.py measures bitwise single==mesh
# equality under JIT while the same programs disagree by ~3e-5 under AOT.
if not os.environ.get("TDGP_TEST_NO_CACHE"):
    _cache_dir = os.environ.get("TDGP_TEST_CACHE_DIR") or compilation_cache_dir(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
