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
    # 0.0, not the jax default 1.0: through the tunneled remote-compile relay
    # even a trivial op program ("jit_add") costs ~0.45 s to compile, and a
    # cold calibration dispatches ~106 of them outside the big jitted
    # programs — ~48 s of the measured ~60 s per-process overhead
    # (scripts/probe_cold_start.py, COLD_ANATOMY run1=88.9 run2=29.0). The
    # 1.0 s threshold exists to keep fast local compiles out of the cache;
    # here no compile is fast.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
