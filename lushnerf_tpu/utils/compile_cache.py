"""Persistent XLA compilation cache.

On this TPU platform, first-time XLA compilation of the large train-step
graphs is very slow (minutes — the compile happens server-side and
surfaces at the first readback).  Execution afterwards is fast.  A
persistent on-disk cache makes every subsequent process reuse compiled
executables, so CLI runs / benchmarks / drivers only ever pay the compile
once per (graph, shape).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    global _enabled
    import jax

    cache_dir = cache_dir or os.environ.get("LUSHNERF_COMPILE_CACHE", _DEFAULT_DIR)
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return cache_dir
