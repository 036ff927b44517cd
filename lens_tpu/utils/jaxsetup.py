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
