"""Profiling hooks (SURVEY.md §5.1 — the reference has wall-clock timers only;
the TPU build adds real device traces via jax.profiler)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/focalnet_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto:

        with trace("/tmp/tr"):
            step(...)  # must block inside the context
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn, *args, iters: int = 10, warmup: int = 3):
    """Wall-clock a jitted callable with proper host sync (the axon tunnel
    does not honor block_until_ready — pull a scalar instead)."""
    import jax.numpy as jnp

    def scalarize(out):
        leaves = [x for x in jax.tree.leaves(out)]
        return float(jnp.sum(leaves[0].ravel()[0])) if leaves else 0.0

    import jax

    for _ in range(warmup):
        scalarize(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        scalarize(fn(*args))
    return (time.time() - t0) / iters


def parse_trace(log_dir: str, min_us: float = 0.0):
    """Aggregate DEVICE-side op time from a jax.profiler trace directory.

    Returns ``{"total_ms": float, "ops": [(name, ms, count, hlo_category),
    ...]}`` sorted by time, summing complete events on the TPU device track
    (the host/python tracks are excluded — through the axon tunnel they
    mostly measure RTT).
    The trustworthy per-op view CLAUDE.md prescribes for any perf claim.
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # LEAF op events only: the device process exposes both an "XLA Modules"
    # track (whole-executable spans) and an "XLA Ops" track (per-op) — summing
    # both double-counts
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and any(k in str(e.get("args", {}).get("name", "")) for k in ("TPU", "/device"))
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))
    }
    agg = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = float(e.get("dur", 0.0))
        if dur < min_us:
            continue
        # Event names are jax named-scope labels (e.g. "op._core.48"); the
        # HLO opcode class lives in args["hlo_category"].  Carry both so
        # op_mix can bucket on the category, not the scope name.
        args = e.get("args", {})
        name = e.get("name", "?")
        cat = str(args.get("hlo_category", ""))
        # control-flow containers ("while", "conditional") span their body
        # ops on the same track — summing them double-counts every op inside
        if cat in ("while", "conditional", "call"):
            continue
        agg[(name, cat)][0] += dur
        agg[(name, cat)][1] += 1
        total += dur
    ops = sorted(
        ((k[0], v[0] / 1000.0, v[1], k[1]) for k, v in agg.items()),
        key=lambda x: -x[1],
    )
    return {"total_ms": total / 1000.0, "ops": ops}


def op_mix(log_dir: str, buckets=None, min_us: float = 0.0):
    """Bucket :func:`parse_trace` output by substring -> ms, for quick
    scan/fusion/layout/conv style breakdowns.

    Matches against ``"<hlo_category> <scope name>"`` lowercased: device
    event *names* are jax named-scope labels ("op._core.48"), so the HLO
    category from the event args is what identifies custom-calls (the Pallas
    scan), convolution/loop fusions, and data-formatting ops.
    """
    r = parse_trace(log_dir, min_us=min_us)
    buckets = buckets or {
        "scan_kernel": ("custom-call", "pallas", "scan"),
        "conv": ("convolution",),
        "fusion": ("fusion",),
        "layout": ("data formatting", "transpose", "copy", "bitcast",
                   "reshape", "slice", "pad"),
    }
    out = {k: 0.0 for k in buckets}
    out["other"] = 0.0
    for name, ms, _count, cat in r["ops"]:
        low = f"{cat} {name}".lower()
        for k, pats in buckets.items():
            if any(p in low for p in pats):
                out[k] += ms
                break
        else:
            out["other"] += ms
    out["total"] = r["total_ms"]
    return out
