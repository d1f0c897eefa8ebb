"""Persistent XLA compilation cache setup.

First compiles of the codec kernels through the remote TPU tunnel cost
minutes (round-2 measurements: Pallas crc32 260 s, v2 batch deflate
470 s).  Those costs are per-process unless JAX's persistent compilation
cache is enabled, so every driver/bench process must call
enable_compile_cache() BEFORE building any jitted kernel.  The cache
lives in-repo (.jax_cache/) so it survives across rounds and processes.

Reference parity note: the reference has no compilation step at all
(plain TS, rollup build only — SURVEY.md C17); this is TPU-build
infrastructure.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache.

    Returns the cache directory.  Safe to call before or after jax
    device initialization; must be called before the first jit compile
    to benefit that compile."""
    global _enabled
    import jax

    cache_dir = path or os.environ.get("TPUZLIB_CACHE_DIR", _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: tunnel compiles are expensive at every size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
