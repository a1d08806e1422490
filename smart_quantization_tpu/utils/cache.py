"""Persistent XLA compilation cache.

TPU compiles through this container's relay cost minutes for a full train
step; the persistent cache makes every run after the first load compiled
executables from disk.  Call once at process start (no-op if unavailable)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SMAQ_COMPILATION_CACHE", os.path.expanduser("~/.cache/smaq_jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax or read-only fs: just skip
        print(f"compilation cache unavailable: {e}")
