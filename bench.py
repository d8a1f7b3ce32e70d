"""Benchmark: 256^2 dehazed images/sec/chip on the flagship (1mlp_g2) model.

Replicates the reference's eval-latency protocol (``ITS/eval.py:39-45``:
batch-1 full-resolution forward, per-image wall clock) on the TPU.  Prints ONE
JSON line.  ``vs_baseline`` is measured against the driver-recorded reference
throughput when available in BASELINE.json (``published``); the reference repo
itself publishes no numbers (BASELINE.md), so it falls back to null.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from focalnet_tpu.models import build_net

    model = build_net("1mlp_g2")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)

    @jax.jit
    def fwd(params, x):
        return jnp.mean(model.apply(params, x)[2])  # scalar forces full sync

    float(fwd(params, x))  # compile
    for _ in range(3):
        float(fwd(params, x))  # warmup

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        v = float(fwd(params, x))
    dt = (time.time() - t0) / iters
    ips = 1.0 / dt

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("published", {}).get("images_per_sec")
    except Exception:
        pass
    vs = (ips / baseline) if baseline else None

    print(json.dumps({
        "metric": "dehaze_256_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
