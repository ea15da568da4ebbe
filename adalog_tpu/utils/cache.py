"""Persistent XLA compilation cache.

The calibration search compiles one large XLA program per (site-shape,
search-family); on a single-core host each compile costs tens of seconds while
steady-state execution is milliseconds. A persistent on-disk cache makes every
run after the first start hot. Called by the CLI and bench entry points (not on
library import).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "ADALOG_TPU_CACHE", os.path.expanduser("~/.cache/adalog_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
