"""Race the chunk-matrix (MXU) scan formulation against the production
Pallas (VPU) kernel at the model's hot shape — the VERDICT-r4 task-1 A/B.

Times are DEVICE times from a jax.profiler trace of an in-jit loop of
dependent calls (wall clocks through the axon tunnel carry ~25 ms RTT;
CLAUDE.md timing trap), reported as ms per call.

Run:  python benchmarks/matrix_race.py [--iters 10] [--L 16384] [--D 768]
"""

from __future__ import annotations

import argparse
import functools
import json
import shutil
import sys
import tempfile

sys.path.insert(0, ".")


def device_ms_per_call(fn, iters, *arrays):
    """Trace an in-jit loop of `iters` dependent calls; return device ms/call
    and the bucketed op mix."""
    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.profiling import op_mix, trace

    @jax.jit
    def many(*xs):
        def body(c, _):
            out = fn(c, *xs[1:])
            s = sum(jnp.sum(t) for t in jax.tree.leaves(out))
            # dependence through the first operand: no parallel dispatch
            return xs[0] * (s * 1e-12 + 1.0), s
        _, ys = jax.lax.scan(body, xs[0], None, length=iters)
        return jnp.mean(ys)

    float(many(*arrays))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="matrix_race_")
    try:
        with trace(tdir):
            float(many(*arrays))
        mix = op_mix(tdir, min_us=0.0)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    total = mix.pop("total", sum(mix.values()))
    return total / iters, {k: round(v / iters, 3) for k, v in mix.items()}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--L", type=int, default=16384)
    p.add_argument("--D", type=int, default=768)
    p.add_argument("--N", type=int, default=16)
    p.add_argument("--G", type=int, default=4)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--matrix_chunks", type=int, nargs="+", default=[64, 128])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")

    from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
    from focalnet_tpu.ops.scan_matrix import selective_scan_matrix

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (args.batch, args.D, args.L)) * 0.5
    # dt in the trained model's range (softplus init in [1e-3, 0.1]): keeps
    # the matrix form's factored exps finite so the race is apples-to-apples
    delta = 0.05 * jax.random.uniform(ks[1], (args.batch, args.D, args.L))
    A = -1.0 - jax.random.uniform(ks[2], (args.D, args.N))
    B = jax.random.normal(ks[3], (args.batch, args.G, args.N, args.L)) * 0.5
    C = jax.random.normal(ks[4], (args.batch, args.G, args.N, args.L)) * 0.5

    impls = {"pallas": selective_scan_pallas}
    for c in args.matrix_chunks:
        # precision=None = default bf16 MXU passes — the matrix form's BEST
        # case (its parity default is "highest"/fp32, ~3x slower matmuls)
        impls[f"matrix_T{c}"] = functools.partial(
            selective_scan_matrix, chunk=c, precision=None)

    rows = []
    for name, fn in impls.items():
        def fwd(u_, delta_, fn=fn):
            return jnp.mean(fn(u_, delta_, A, B, C, delta_softplus=False))

        for mode, g in [("fwd", fwd), ("fwdbwd", jax.grad(fwd, argnums=(0, 1)))]:
            ms, mix = device_ms_per_call(g, args.iters, u, delta)
            print(f"{name:12s} {mode:6s} {ms:8.2f} ms/call  mix={mix}")
            rows.append({"impl": name, "mode": mode, "device_ms": round(ms, 3),
                         "mix": mix})

    with open("/tmp/matrix_race.json", "w") as f:
        json.dump({"shape": vars(args), "rows": rows}, f, indent=1)
    print("wrote /tmp/matrix_race.json")


if __name__ == "__main__":
    main()
