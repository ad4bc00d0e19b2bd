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


def machine_cache_key() -> str:
    """Host-microarch fingerprint for persistent-compilation-cache dirs.

    XLA's persistent cache key covers the HLO + compile options but NOT the
    compile machine's CPU features; a cache dir carried to a different VM
    serves AOT executables built for foreign microarch (observed:
    cpu_aot_loader "prefer-no-scatter is not supported on the host machine"
    warnings, ~2e-5 numeric skew vs a fresh compile — enough to fail grad
    bit-equivalence — and a documented SIGILL risk). Keying the dir by CPU
    flags + jax version quarantines each machine's blobs."""
    import hashlib
    import platform as _platform

    import jax
    try:
        with open('/proc/cpuinfo') as f:
            # x86 exposes 'flags', aarch64 'Features'; grab whichever
            flags_line = next((l for l in f
                               if l.startswith(('flags', 'Features'))), '')
    except OSError:
        flags_line = ''
    if not flags_line:
        # no /proc (macOS/Windows) or an unexpected format: fall back to
        # the fullest host description available so two different machines
        # still land in different dirs (a constant fallback would silently
        # re-enable the cross-machine AOT contamination this key prevents)
        flags_line = f'{_platform.platform()}|{_platform.processor()}'
    raw = f'{jax.__version__}|{_platform.machine()}|{flags_line}'
    return hashlib.md5(raw.encode()).hexdigest()[:12]


def compilation_cache_dir(root: str) -> str:
    """Machine-keyed subdir of ``root`` for jax_compilation_cache_dir."""
    return os.path.join(root, machine_cache_key())
