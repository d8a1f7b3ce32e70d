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

# persistent compilation cache: repeated suite runs skip recompiles
# (the single-core host spends most of the suite compiling otherwise)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.jax_cache_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
