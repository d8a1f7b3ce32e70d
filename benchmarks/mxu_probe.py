"""MXU rate probe for the chunk-matrix (tril-mask / SSD-style) scan form.

VERDICT-r4 task 1 asks for the reference's matrix formulation
(`kernels/selective_scan/test_selective_scan_easy.py:391-466` v2,
`SelectiveScanMatrix:594`) to be raced against the VPU Pallas scan — or a
rejection note "with the measured MXU rate, the per-channel flop count, and
why it loses".  The formulation's matmuls at the live model's S6 shapes are:

  M-build   (D,T,N)@(D,N,T) -> (D,T,T)   contraction K = d_state = 16
  M-apply   (D,T,T)@(D,T,1) -> (D,T,1)   per-channel matvec (value dim = 1)
  bwd dq/dk (D,T,T)@(D,T,N)              contraction K = T (the good one)
  bwd dM    (D,T,1)@(D,1,T)              outer product (K = 1)

because the decay exp(A_dn * cumsum(dt_dt')) depends jointly on the channel
d AND the state n (S6: per-channel delta, per-(d,n) A), every instance is an
independent per-channel matmul with a tiny non-batch dimension.  This probe
measures what the MXU actually delivers on each shape (bf16 and fp32), plus
a square batched-matmul control for the achievable ceiling.

Run on the real chip:  python benchmarks/mxu_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def _chain_dot(a, b, iters: int, precision=None):
    """lax.scan of `iters` dependent batched dots (RTT-amortized timing)."""

    dn = (((a.ndim - 1,), (b.ndim - 2,)), (((0,), (0,)) if a.ndim == 3 else ((), ())))

    def body(carry, _):
        out = lax.dot_general(carry, b, dn, precision=precision)
        # feed the output back with a reshape-free rescale so the chain is
        # data-dependent (no DCE / no parallel dispatch) but shape-stable
        nxt = a * (out.ravel()[0] * 1e-9 + 1.0)
        return nxt, out.ravel()[0]

    def run(a0):
        _, ys = lax.scan(body, a0, None, length=iters)
        return ys.sum()

    return jax.jit(run)


def time_dot(name, ashape, bshape, dtype, iters=30, precision=None, key=0):
    """Trace-based device timing.  Wall clocks through the axon tunnel carry
    ~25 ms RTT and ms-scale jitter — far above these µs-scale dots — so the
    per-iteration cost is read from a jax.profiler device trace instead
    (total device ms across the scan body / iters; includes the chain's
    rescale pass, so it upper-bounds the dot itself)."""
    import shutil
    import tempfile

    from focalnet_tpu.utils.profiling import parse_trace, trace

    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    a = jax.random.normal(k1, ashape, dtype)
    b = jax.random.normal(k2, bshape, dtype)
    fn = _chain_dot(a, b, iters, precision)
    float(fn(a))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="mxu_probe_")
    try:
        with trace(tdir):
            float(fn(a))
        r = parse_trace(tdir, min_us=0.0)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    dt = r["total_ms"] / 1000.0
    iters_eff = iters
    # useful MACs of one dot
    if len(ashape) == 3:
        d, m, k = ashape
        n = bshape[-1]
        macs = d * m * k * n
    else:
        m, k = ashape
        n = bshape[-1]
        macs = m * k * n
    ms = dt * 1000.0 / iters_eff
    tflops = 2 * macs / (ms * 1e-3) / 1e12
    print(
        f"{name:42s} {str(dtype):>8s} prec={str(precision):>8s} "
        f"{ms:8.3f} ms/dot  {tflops:7.2f} TF/s useful"
    )
    return {"name": name, "dtype": str(dtype), "precision": str(precision),
            "ms": ms, "tflops_useful": tflops, "a": ashape, "b": bshape}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dblk", type=int, default=768)
    args = ap.parse_args()

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")

    T, N, D = 128, 16, args.dblk
    rows = []
    for dt in (jnp.bfloat16, jnp.float32):
        rows.append(time_dot("control square (D,T,T)@(D,T,T)", (D, T, T), (D, T, T), dt, args.iters))
        rows.append(time_dot("M-build (D,T,N)@(D,N,T)", (D, T, N), (D, N, T), dt, args.iters))
        rows.append(time_dot("M-apply matvec (D,T,T)@(D,T,1)", (D, T, T), (D, T, 1), dt, args.iters))
        rows.append(time_dot("M-apply 8-wide (D,T,T)@(D,T,8)", (D, T, T), (D, T, 8), dt, args.iters))
        rows.append(time_dot("bwd dq (D,T,T)@(D,T,N)", (D, T, T), (D, T, N), dt, args.iters))
        rows.append(time_dot("bwd dM outer (D,T,1)@(D,1,T)", (D, T, 1), (D, 1, T), dt, args.iters))
    # fp32-parity path = HIGHEST precision matmuls
    rows.append(time_dot("M-build fp32 HIGHEST", (D, T, N), (D, N, T), jnp.float32, args.iters, lax.Precision.HIGHEST))
    rows.append(time_dot("control square fp32 HIGHEST", (D, T, T), (D, T, T), jnp.float32, args.iters, lax.Precision.HIGHEST))
    with open("/tmp/mxu_probe.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote /tmp/mxu_probe.json")


if __name__ == "__main__":
    main()
