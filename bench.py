"""Benchmark: 256^2 dehazed images/sec/chip on the flagship (1mlp_g2) model.

Replicates the reference's eval protocol shape (batch-1 full-resolution
forward, ``ITS/eval.py:39-45``) but measures device throughput by running
dependent forwards inside one jit — the axon tunnel adds ~25ms RTT per
dispatch and does not honor block_until_ready, which would otherwise dominate
and mask real kernel progress between rounds.  Prints ONE JSON line.

``vs_baseline`` compares against ``BASELINE.json``'s ``published`` throughput
when present; the reference repo publishes no numbers (BASELINE.md), so it
defaults to null.
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

    # 50 dependent in-jit forwards: the residual tunnel-RTT amortization is
    # ~25/50 = 0.5 ms/img of phantom fixed cost (CLAUDE.md timing trap); the
    # profiler-traced device forward is 10.95 ms/img, so the printed figure
    # under-reads true device throughput by ~5%.
    iters = 50

    @jax.jit
    def many(params, x):
        def body(c, _):
            y = model.apply(params, x + c * 1e-9)[2]
            return c + 1.0, jnp.mean(y)
        c, ys = jax.lax.scan(body, 0.0, None, length=iters)
        return jnp.mean(ys)  # scalar pull forces full host sync

    float(many(params, x))  # compile
    float(many(params, x))  # warmup
    best = None
    for _ in range(3):  # best-of-3 guards against tunnel congestion spikes
        t0 = time.time()
        float(many(params, x))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ips = iters / best

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("published", {}).get("images_per_sec")
    except Exception:
        pass
    vs = round(ips / baseline, 3) if baseline else None

    print(json.dumps({
        "metric": "dehaze_256_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
