"""Persistent XLA compilation cache (TPU compiles are expensive: ~5-30s per
Pallas shape, minutes for the full train step — cache them across processes)."""

from __future__ import annotations

import os


def _host_cpu_tag() -> str:
    """Fingerprint of the host CPU's feature set.

    XLA:CPU cache entries are AOT executables for the exact host
    microarchitecture; loading one compiled on a different machine can
    segfault (see tests/conftest.py).  CPU cache dirs are keyed by this tag
    so the repo can move between hosts.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            src = next(l for l in f if l.startswith("flags"))
    except Exception:
        import platform

        src = platform.processor() or platform.machine()
    return hashlib.md5(src.encode()).hexdigest()[:8]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("FOCALNET_COMPILE_CACHE")
    if path is None:
        # decided from the env var (not jax.default_backend(), which would
        # initialize the backend — and hang here if the TPU tunnel is down)
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            path = os.path.expanduser(f"~/.jax_cache_cpu_{_host_cpu_tag()}")
        else:
            path = os.path.expanduser("~/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


def use_cpu_cache() -> None:
    """Re-point the cache at the host-fingerprinted CPU dir.

    MUST be called by any code path that falls back to the CPU backend at
    runtime (e.g. the CLI's tunnel-outage fallback) after
    :func:`enable_compilation_cache` already chose the TPU dir from the env
    var: XLA:CPU AOT entries written into the cross-host ``~/.jax_cache``
    can SEGFAULT a later run on a different machine (the conftest bug class).
    """
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(f"~/.jax_cache_cpu_{_host_cpu_tag()}"),
        )
    except Exception:
        pass
