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


# XLA's CPU target builder adds microarchitecture TUNING preferences (not
# CPUID features) to the compile-time feature string on hosts where
# gather/scatter downclock; LLVM's host probe never reports them, so
# cpu_aot_loader.cc logs a "could lead to ... SIGILL" error on EVERY
# same-host load of a cached XLA:CPU executable.  With the cache dir keyed
# by the full CPUID identity (above), entries are same-host by construction
# and the only feature delta is this benign set — verified against the
# logged feature lists per line (a REAL ISA mismatch still passes through).
_AOT_TUNING_FEATURES = frozenset({"prefer-no-gather", "prefer-no-scatter"})

_AOT_LINE_RE = None  # compiled lazily


def aot_warning_missing_features(line: str):
    """Parse a cpu_aot_loader machine-features warning.

    Returns the set of '+' compile-time features absent from the host list,
    or ``None`` if the line is not such a warning.
    """
    global _AOT_LINE_RE
    import re

    if _AOT_LINE_RE is None:
        _AOT_LINE_RE = re.compile(
            r"Loading XLA:CPU AOT result.*"
            r"Compile machine features: \[([^\]]*)\] vs "
            r"host machine features: \[([^\]]*)\]"
        )
    m = _AOT_LINE_RE.search(line)
    if not m:
        return None
    compile_feats = {t.strip() for t in m.group(1).split(",") if t.strip()}
    host_feats = {t.strip().lstrip("+") for t in m.group(2).split(",") if t.strip()}
    required = {t[1:] for t in compile_feats if t.startswith("+")}
    return required - host_feats


def _is_benign_aot_line(line: str) -> bool:
    missing = aot_warning_missing_features(line)
    return missing is not None and missing <= _AOT_TUNING_FEATURES


def filter_benign_aot_warnings():
    """Context manager: drop cpu_aot_loader feature warnings from fd 2 IFF
    the compile-vs-host delta is exactly XLA's tuning preferences.

    The log comes from C++ (absl raw write to fd 2), so a Python-level
    stderr wrapper cannot intercept it; this temporarily routes fd 2
    through a pipe + filter thread.  Lines reporting a REAL missing ISA
    feature — the cross-host entry class that can SIGILL — are passed
    through untouched.  Used by the driver contracts (__graft_entry__,
    bench) so their tails stay clean without masking genuine mismatches.
    """
    import contextlib
    import sys
    import threading

    @contextlib.contextmanager
    def _cm():
        try:
            sys.stderr.flush()
        except Exception:
            pass
        real = os.dup(2)
        r, w = os.pipe()
        os.dup2(w, 2)
        os.close(w)

        def pump():
            buf = b""
            while True:
                try:
                    chunk = os.read(r, 65536)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
                *lines, buf = buf.split(b"\n")
                for ln in lines:
                    if not _is_benign_aot_line(ln.decode("utf-8", "replace")):
                        os.write(real, ln + b"\n")
            if buf and not _is_benign_aot_line(buf.decode("utf-8", "replace")):
                os.write(real, buf)
            os.close(r)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        try:
            yield
        finally:
            try:
                sys.stderr.flush()
            except Exception:
                pass
            os.dup2(real, 2)  # drops the pipe's last write end -> EOF -> pump exits
            t.join(timeout=5)
            os.close(real)

    return _cm()


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
