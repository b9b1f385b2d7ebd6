"""Persistent XLA compilation cache.

XLA compiles are expensive (tens of seconds for the full U-Net; this dev
host has a single CPU core where even one conv costs ~30s+). The persistent
cache makes every graph a one-time cost across processes — important for
both the CPU test environment and the real-TPU bench/CLI runs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "DMTPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/jax_comp")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
