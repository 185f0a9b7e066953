"""Persistent XLA compilation cache.

This environment compiles TPU programs through a remote-compile tunnel with
high per-program latency (a 260k-element sort costs ~20s cold, a full
metric-tracking training scan ~5 min). The persistent cache brings warm-start
process launches down to milliseconds, so entry points enable it by default.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("DLRS_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
