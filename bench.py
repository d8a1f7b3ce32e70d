"""Benchmark: 256^2 dehazed images/sec/chip on the flagship (1mlp_g2) model.

Replicates the reference's eval protocol shape (batch-1 full-resolution
forward, ``ITS/eval.py:39-45``) but measures device throughput by timing two
in-jit loops of dependent forwards (50 and 100 iterations) and differencing —
the axon tunnel adds ~25ms RTT per dispatch and does not honor
block_until_ready, so a single timed loop carries RTT/n of phantom per-image
cost; the difference of two loop lengths cancels the fixed cost exactly.
Prints ONE JSON line.

``vs_baseline`` compares against ``BASELINE.json``'s ``published`` throughput
when present; the reference repo publishes no numbers (BASELINE.md), so it
defaults to null.
"""

import json
import time


def main():
    import os
    import sys
    import threading

    # fail fast instead of hanging the driver if the axon tunnel is down
    # (device claim blocks inside jax backend init with no timeout of its own)
    budget = float(os.environ.get("FOCALNET_BENCH_TIMEOUT", "3600"))
    done = threading.Event()

    def watchdog():
        if not done.wait(budget):
            print(f"bench.py watchdog: no result after {budget:.0f}s "
                  "(TPU tunnel down?)", file=sys.stderr)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from focalnet_tpu.models import build_net

    model = build_net("1mlp_g2")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)

    # Two in-jit loops of dependent forwards, 50 and 100 iterations.  Each
    # timed call pays the same fixed cost (one ~25 ms tunnel RTT + dispatch),
    # so t(100) - t(50) is the device time of exactly 50 forwards with the
    # fixed cost cancelled — the CLAUDE.md timing trap eliminated by
    # construction instead of amortized.  Cross-checked against the
    # jax.profiler device trace (10.95 ms/img at this shape, BASELINE.md).
    def make_many(iters):
        @jax.jit
        def many(params, x):
            def body(c, _):
                y = model.apply(params, x + c * 1e-9)[2]
                return c + 1.0, jnp.mean(y)
            c, ys = jax.lax.scan(body, 0.0, None, length=iters)
            return jnp.mean(ys)  # scalar pull forces full host sync
        return many

    many50, many100 = make_many(50), make_many(100)

    def timed(fn):
        t0 = time.time()
        float(fn(params, x))
        return time.time() - t0

    timed(many50), timed(many100)  # compile
    timed(many50), timed(many100)  # warmup
    # best-of-3 per length guards against tunnel congestion spikes
    t50 = min(timed(many50) for _ in range(3))
    t100 = min(timed(many100) for _ in range(3))
    dt = t100 - t50
    # sanity: the device time of 50 forwards is ~0.55 s here; if congestion
    # jitter ever swamps the difference, fall back to the amortized estimate
    # (which only UNDER-reads, by the fixed cost / 100)
    ips = 50 / dt if dt > 0.2 * t50 else 100 / t100

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("published", {}).get("images_per_sec")
    except Exception:
        pass
    vs = round(ips / baseline, 3) if baseline else None

    done.set()
    print(json.dumps({
        "metric": "dehaze_256_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
