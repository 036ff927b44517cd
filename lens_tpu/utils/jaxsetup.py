"""Process-wide JAX configuration.

The axon-tunneled TPU compiles slowly (minutes for the first trace), so every
entry point enables the persistent compilation cache — second and later runs
of the same program shapes load compiled executables from disk.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        if cache_dir is not None:
            # An explicit directory overrides whatever an earlier (default)
            # call configured — silently dropping the caller's directive
            # would land slow recompiles on the wrong volume.
            import jax

            os.makedirs(os.path.abspath(cache_dir), exist_ok=True)
            jax.config.update(
                "jax_compilation_cache_dir", os.path.abspath(cache_dir)
            )
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LENS_TPU_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _DONE = True


def force_cpu(min_devices: int = 1) -> None:
    """Force the CPU backend (virtual multi-device via XLA_FLAGS).

    The axon sitecustomize appends its TPU backend to jax_platforms
    unconditionally, so the JAX_PLATFORMS env var alone cannot select CPU —
    the config must be overridden before first backend use.
    """
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if min_devices > 1:
        if m is None:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={min_devices}"
            ).strip()
        elif int(m.group(1)) < min_devices:
            # A pre-set smaller count would silently starve the multichip
            # tests of their virtual devices; min_devices is a MINIMUM.
            os.environ["XLA_FLAGS"] = flags.replace(
                m.group(0),
                f"--xla_force_host_platform_device_count={min_devices}",
            )
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; caller must set env before import
