"""JAX runtime configuration helpers for the CLI entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Enable the persistent XLA compilation cache so repeated CLI invocations
    skip recompiles (kernel shapes are bucketed, so the cache is small)."""
    import jax
    cache_dir = path or os.environ.get(
        "GGT_JAX_CACHE", os.path.expanduser("~/.cache/ggt_jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
