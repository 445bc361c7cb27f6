"""Process-level JAX configuration for framework entry points.

XLA:TPU compiles of the search programs are expensive (tens of seconds to
minutes for the scan-heavy golden path); the persistent compilation cache
makes them one-time per machine. Called by the CLI, the bench runner, and
the pipeline; importing the library alone does not touch jax config.
"""
from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache = cache_dir or os.environ.get(
        "ME_TPU_COMPILE_CACHE", "/tmp/jax_comp_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _DONE = True
