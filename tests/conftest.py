"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4 implication).

Must set env vars before jax initializes its backends.
"""

import os

# Opt out of the CPU mesh with FOCALNET_TPU_TESTS=1 to run
# tests/test_tpu_only.py against the real chip.
_REAL_TPU = os.environ.get("FOCALNET_TPU_TESTS") == "1"

if not _REAL_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _REAL_TPU:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache — OPT-IN via FOCALNET_TEST_CACHE=1, which
# tests/run_suite.sh sets (it runs one pytest process per file).  Default is
# OFF because XLA:CPU cache get/put segfaults/aborts nondeterministically in
# long multi-file pytest processes (observed repeatedly at different tests,
# always inside compilation_cache.{get,put}_executable_and_time), so a plain
# `pytest tests/` must not touch it.  The dir is additionally keyed by a
# host-CPU fingerprint: cache entries are AOT executables for the exact host
# microarchitecture, and loading one produced on a different machine can
# also segfault ("Machine type used for XLA:CPU compilation doesn't match"
# warnings precede it).
from focalnet_tpu.utils.cache import _host_cpu_tag  # noqa: E402  (one shared
# fingerprint implementation — drift between copies would silently split the
# cache dirs the suite, the library, and the dryrun are meant to share)


if _REAL_TPU:
    # On the real chip the cache is unconditional: the segfault rationale
    # above is specific to XLA:CPU AOT entries, and Pallas shapes take
    # 5-10 s each to compile through the tunnel.  Same dir as the library's
    # enable_compilation_cache().
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "FOCALNET_COMPILE_CACHE", os.path.expanduser("~/.jax_cache")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
elif os.environ.get("FOCALNET_TEST_CACHE") == "1":
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(f"~/.jax_cache_tests_{_host_cpu_tag()}"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
