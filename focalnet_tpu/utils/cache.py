"""Persistent XLA compilation cache (TPU compiles are expensive: ~5-30s per
Pallas shape, minutes for the full train step — cache them across processes)."""

from __future__ import annotations

import os


def _host_cpu_identity(cpuinfo_text: str | None = None) -> str:
    """Canonical identity string for the host CPU microarchitecture.

    XLA:CPU AOT executables are specialized by LLVM host detection, which
    keys off CPUID (vendor/family/model/stepping → subtarget) as well as the
    feature flags.  Round 4's flags-only md5 was provably porous: the driver
    dryrun loaded a cache entry whose XLA-recorded machine features
    mismatched the host ("could lead to execution errors such as SIGILL").
    So the identity includes every CPUID-derived field /proc/cpuinfo exposes
    plus the *sorted set* of flags (order-independent), plus the jaxlib
    version (serialized-executable format owner).  `cpuinfo_text` is
    injectable for the sensitivity unit test.
    """
    import platform

    fields = {
        "vendor_id",
        "cpu family",
        "model",
        "model name",
        "stepping",
        "microcode",
    }
    ident: dict[str, str] = {}
    flags: list[str] = []
    try:
        if cpuinfo_text is None:
            with open("/proc/cpuinfo") as f:
                cpuinfo_text = f.read()
        for line in cpuinfo_text.splitlines():
            if ":" not in line:
                continue
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip()
            if k in fields and k not in ident:
                ident[k] = v
            elif k == "flags" and not flags:
                flags = sorted(v.split())
    except Exception:
        ident["fallback"] = platform.processor() or platform.machine()
    ident["arch"] = platform.machine()
    try:
        import jaxlib.version

        ident["jaxlib"] = jaxlib.version.__version__
    except Exception:
        pass
    parts = [f"{k}={ident[k]}" for k in sorted(ident)]
    parts.append("flags=" + ",".join(flags))
    return ";".join(parts)


def _host_cpu_tag(cpuinfo_text: str | None = None) -> str:
    """Fingerprint of the host CPU's microarchitecture identity.

    XLA:CPU cache entries are AOT executables for the exact host
    microarchitecture; loading one compiled on a different machine can
    segfault (see tests/conftest.py).  CPU cache dirs are keyed by this tag
    so the repo can move between hosts.
    """
    import hashlib

    return hashlib.md5(_host_cpu_identity(cpuinfo_text).encode()).hexdigest()[:8]


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
