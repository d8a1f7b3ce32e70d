"""Persistent XLA compilation cache (TPU compiles are expensive: ~5-30s per
Pallas shape, minutes for the full train step — cache them across processes)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "FOCALNET_COMPILE_CACHE", os.path.expanduser("~/.jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
