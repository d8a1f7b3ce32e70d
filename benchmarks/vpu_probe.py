"""Measured VPU ceiling for the selective-scan kernel (BASELINE.md r5).

The scan's per-bucket ceiling argument rests on the claim that the Pallas
kernel runs at the VPU's pass rate (hand-counted in r2/r3).  This probe
MEASURES the denominator on the chip: a Pallas kernel with the scan's grid/
block decomposition executing P dependent fma passes over the scan's own
(B, 1, D, L) operand, timed from the PROFILER DEVICE TRACE (wall clocks
through the axon tunnel carry +-10 ms RTT jitter — larger than the whole
kernel; CLAUDE.md timing trap).  Two P values difference away fixed
overhead; the scan kernel is trace-timed in the same session.

Units: one "pass" = one fma over every element of (B, D, L).  The S6
recurrence+output math is >= 9*N/2 fma per element (the reference's
9*B*L*D*N flop cost model, ``ITS/models/vmamba_layers.py:96-117``), i.e.
72 pass-equivalents at N=16 — exp/softplus/rolls cost extra on top, so a
measured pass-equivalent count moderately above 72 IS the ceiling.

Usage:
    python benchmarks/vpu_probe.py [--B 4] [--D 192] [--L 16384] [--N 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNROLL = 8  # fma passes per loop iteration (distinct multipliers)


def make_pass_kernel(n_loop: int, D_blk: int, T: int):
    """P = UNROLL * n_loop dependent fma passes over each block."""
    import jax
    from jax.experimental import pallas as pl

    cs = [1.0 + 1e-6 * (i + 1) for i in range(UNROLL)]

    def body(x_ref, o_ref):
        x = x_ref[...]

        def step(_, acc):
            for c in cs:  # UNROLL dependent fma passes
                acc = acc * c + x
            return acc

        o_ref[...] = jax.lax.fori_loop(0, n_loop, step, x)

    @jax.jit
    def run(x):
        B, G, D, L = x.shape
        grid = (B, G, D // D_blk, L // T)
        spec = pl.BlockSpec(
            (1, 1, D_blk, T), lambda b, g, j, i: (b, g, j, i))
        return pl.pallas_call(
            body, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    return run


def device_ms(fn, *args, iters=4, tag="probe"):
    """Total custom-call device ms per iteration, from a profiler trace."""
    import glob
    import shutil
    import tempfile

    import jax.numpy as jnp

    from focalnet_tpu.utils.profiling import parse_trace, trace

    d = tempfile.mkdtemp(prefix=f"vpu_{tag}_")
    pull = lambda: float(jnp.sum(fn(*args)[0, 0, 0, :1]))
    pull(); pull()  # compile + warm
    try:
        with trace(d):
            for _ in range(iters):
                pull()
        r = parse_trace(d, min_us=0.0)
        ms = sum(m for _, m, _, cat in r["ops"] if "custom" in cat.lower())
        return ms / iters
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=4)
    p.add_argument("--D", type=int, default=192)
    p.add_argument("--L", type=int, default=16384)
    p.add_argument("--N", type=int, default=16)
    p.add_argument("--D_blk", type=int, default=64)
    p.add_argument("--T", type=int, default=2048)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, D, L, N = args.B, args.D, args.L, args.N
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 1, D, L), jax.numpy.float32)

    loops = (8, 64)  # P = 64 and 512 passes
    ts = []
    for n_loop in loops:
        fn = make_pass_kernel(n_loop, args.D_blk, args.T)
        t = device_ms(fn, x, tag=f"p{n_loop}")
        ts.append(t)
        print(f"  P={UNROLL * n_loop:4d} passes: {t:8.3f} ms device")
    per_pass = (ts[1] - ts[0]) / (UNROLL * (loops[1] - loops[0]))
    elems = B * D * L
    fma_rate = elems / (per_pass * 1e-3)
    print(f"per-pass {per_pass * 1e3:.1f} us -> "
          f"{2 * fma_rate / 1e12:.2f} TFLOP/s fp32 fma over the scan blocks")

    # the production scan kernel at the same shape, same trace harness
    from focalnet_tpu.ops.selective_scan import selective_scan

    A = -np.exp(np.random.RandomState(0).rand(D, N)).astype(np.float32)
    dl = jax.random.uniform(jax.random.PRNGKey(1), (B, D, L)) * 0.1
    Bm = jax.random.uniform(jax.random.PRNGKey(2), (B, 1, N, L))
    Cm = jax.random.uniform(jax.random.PRNGKey(3), (B, 1, N, L))

    @jax.jit
    def scan(u3, dl, Bm, Cm):
        return selective_scan(u3, dl, A, Bm, Cm, delta_softplus=True,
                              backend="pallas")

    t_scan = device_ms(
        lambda u3, dl, Bm, Cm: scan(u3, dl, Bm, Cm)[:, None],
        x[:, 0], dl, Bm, Cm, tag="scan")

    n_eq = t_scan / per_pass
    bound = 9 * N / 2  # fma pass-equivalents per element, cost-model floor
    print(json.dumps({
        "metric": "scan_vpu_ceiling",
        "scan_fwd_device_ms": round(t_scan, 3),
        "probe_fma_tflops": round(2 * fma_rate / 1e12, 2),
        "pass_equivalents": round(n_eq, 1),
        "cost_model_floor_passes": bound,
        "ratio_to_arithmetic_floor": round(n_eq / bound, 2),
    }))


if __name__ == "__main__":
    main()
