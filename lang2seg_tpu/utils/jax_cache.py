"""Persistent XLA compile-cache setup that survives jax pre-import.

This environment's site plugin (sitecustomize) imports jax at
interpreter startup, so `os.environ[...] = ...` lines at the top of a
script run AFTER jax has already read its env-derived config — the
JAX_COMPILATION_CACHE_DIR convention becomes a silent no-op and every
cold run re-pays multi-minute XLA compiles. The jax config API always
lands; call this right after `import jax` instead.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default: the
    JAX_COMPILATION_CACHE_DIR env var, else /tmp/lang2seg_jax_cache) and
    drop the min-compile-time/size thresholds so every executable is
    cached. Returns the directory used."""
    import jax
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/lang2seg_jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
