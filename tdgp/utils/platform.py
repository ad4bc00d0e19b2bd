"""JAX platform-selection helper for CLI entry points.

Some device plugins (e.g. the axon TPU tunnel) force ``jax_platforms`` at
registration time, which silently overrides the ``JAX_PLATFORMS`` env var a
user set to run a script offline (``JAX_PLATFORMS=cpu python scripts/...``).
Re-asserting the env value through ``jax.config`` — before any backend
initializes — restores the documented env-var semantics. Counterpart of the
reference's device plumbing being torch-implicit (no analogue needed there).
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """If JAX_PLATFORMS is set, make it effective even when a device plugin
    overrode ``jax_platforms`` at import time. Call before the first
    ``jax.devices()`` / array creation; a no-op once backends initialized."""
    val = os.environ.get('JAX_PLATFORMS')
    if val:
        import jax
        jax.config.update('jax_platforms', val)
