"""Persistent XLA compilation cache.

Compiles over the axon TPU tunnel cost O(minutes) for production-shape models; the
persistent cache turns every repeat run (bench reruns, resumed training, CLI restarts)
into a cache hit. Call once at entry-point start.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "PTT_COMPILE_CACHE", os.path.expanduser("~/.cache/ptt_xla_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
