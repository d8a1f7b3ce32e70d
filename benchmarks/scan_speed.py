"""Selective-scan speed harness — the reference's kernel benchmark equivalent
(``/root/reference/kernels/selective_scan/test_selective_scan_speed.py:408-519``:
wall-clock fwd and fwd+bwd loops over implementations).

Usage:
    python benchmarks/scan_speed.py [--L 1024 4096 16384] [--iters 10]

Prints one line per (impl, mode, L): ``(mode, impl, L, ms_per_call)``.
Timings amortize the TPU tunnel dispatch by running ``iters`` dependent
calls inside one jit (host-sync via scalar pull).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, nargs="+", default=[1024, 4096, 16384])
    p.add_argument("--D", type=int, default=768)
    p.add_argument("--N", type=int, default=16)
    p.add_argument("--G", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chunks", type=int, nargs="+", default=[512],
                   help="pallas chunk sizes to sweep (T grid dimension)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
    from focalnet_tpu.ops.scan_chunked import selective_scan_chunked

    import functools

    impls = {"chunked_xla": selective_scan_chunked}
    for c in args.chunks:
        impls[f"pallas_T{c}"] = functools.partial(selective_scan_pallas, chunk=c)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    for L in args.L:
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        u = jax.random.normal(ks[0], (args.batch, args.D, L)) * 0.5
        delta = 0.5 * jax.random.uniform(ks[1], (args.batch, args.D, L))
        A = -1.0 - jax.random.uniform(ks[2], (args.D, args.N))
        B = jax.random.normal(ks[3], (args.batch, args.G, args.N, L)) * 0.5
        C = jax.random.normal(ks[4], (args.batch, args.G, args.N, L)) * 0.5

        for name, fn in impls.items():
            def fwd_loss(u, delta):
                return jnp.mean(fn(u, delta, A, B, C, delta_softplus=True))

            for mode, g in [
                ("fwd", fwd_loss),
                ("fwdbwd", jax.grad(fwd_loss, argnums=(0, 1))),
            ]:
                @jax.jit
                def many(u, delta, g=g):
                    def body(c, _):
                        out = g(u, delta + c * 1e-9)
                        s = sum(jnp.sum(t) for t in jax.tree.leaves(out))
                        return c + 1.0, s
                    c, ys = jax.lax.scan(body, 0.0, None, length=args.iters)
                    return jnp.mean(ys)

                float(many(u, delta))  # compile
                t0 = time.time()
                float(many(u, delta))
                ms = (time.time() - t0) / args.iters * 1e3
                print(("%s" % mode, name, L, round(ms, 2)))


if __name__ == "__main__":
    main()
