"""Attribute the layout/copy bucket of a train-step trace, source by source.

VERDICT-r4 task 4: the bs4 train step carries ~24.8 ms of data-formatting
ops (~13.6 GB/step) of which only ~7 ms was attributed; the rest was "a flat
~800-copy tail".  This tool names that tail: every device-side
data-formatting event in a jax.profiler trace carries the full HLO
instruction text (``long_name``) including shapes WITH layouts and
``bytes_accessed`` — so the tail can be grouped into named sources and
ranked by ms and bytes without an HLO dump (which the axon tunnel's
server-side compile does not produce locally).

Usage:
    python benchmarks/copy_inventory.py /tmp/tr_fp32 [--top 15] [--ops]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


LAYOUT_CATS = ("data formatting", "copy", "copy-start", "copy-done",
               "transpose", "bitcast", "reshape", "slice", "pad")


def load_events(log_dir: str):
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and any(k in str(e.get("args", {}).get("name", ""))
                for k in ("TPU", "/device"))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))
    }
    return [e for e in events
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]


_SHAPE = re.compile(r"((?:f32|bf16|f16|s32|u32|s8|u8|pred)\[[0-9,]*\](?:\{[^}]*\})?)")


def signature(long_name: str, name: str) -> str:
    """Collapse an HLO instruction into a stable source signature.

    Strategy: opcode + output shape-with-layout + (for copies) the operand
    shape-with-layout — a copy that changes {2,0,1} -> {2,1,0} groups with
    every other copy doing the same relayout at the same shape, regardless
    of its HLO number.
    """
    opcode = re.sub(r"[.\d]+$", "", name)
    m = re.match(r"%\S+ = (\S+\[[^ ]*) ([a-z\-]+)\(", long_name)
    shapes = _SHAPE.findall(long_name)
    out_shape = shapes[0] if shapes else "?"
    operand_shape = shapes[1] if len(shapes) > 1 else ""
    op = m.group(2) if m else opcode
    sig = f"{op} {out_shape}"
    if operand_shape and operand_shape != out_shape:
        sig += f" <- {operand_shape}"
    # annotate host-offload/SMEM space hints (S(1)=SMEM? actually S = memory space)
    return sig


def operand_hint(long_name: str) -> str:
    """Best-effort producer hint: the operand's instruction name."""
    m = re.search(r"\(\s*(?:\([^)]*\)|[^()%]*)?%([\w.\-_]+)", long_name)
    return m.group(1)[:60] if m else "?"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--ops", action="store_true",
                   help="also list the single largest individual events")
    p.add_argument("--cat", default="layout",
                   help="'layout' or an hlo_category substring")
    args = p.parse_args(argv)

    events = load_events(args.trace_dir)
    rows = collections.defaultdict(lambda: [0.0, 0, 0, set()])
    total_ms = 0.0
    total_bytes = 0
    for e in events:
        a = e.get("args", {})
        cat = str(a.get("hlo_category", ""))
        name = e.get("name", "?")
        low = f"{cat} {name}".lower()
        if args.cat == "layout":
            if not any(c in low for c in LAYOUT_CATS):
                continue
            if "fusion" in cat:  # convolution/loop fusions with bitcast in name
                continue
        elif args.cat not in low:
            continue
        ms = float(e.get("dur", 0.0)) / 1000.0
        b = int(a.get("bytes_accessed", 0) or 0)
        sig = signature(str(a.get("long_name", "")), name)
        r = rows[sig]
        r[0] += ms
        r[1] += 1
        r[2] += b
        r[3].add(operand_hint(str(a.get("long_name", ""))))
        total_ms += ms
        total_bytes += b

    print(f"bucket total: {total_ms:.2f} ms, "
          f"{total_bytes / 1e9:.2f} GB accessed, "
          f"{sum(r[1] for r in rows.values())} events, "
          f"{len(rows)} distinct signatures")
    ranked = sorted(rows.items(), key=lambda kv: -kv[1][0])
    print(f"\n top {args.top} by ms:")
    shown_ms = 0.0
    for sig, (ms, cnt, b, hints) in ranked[: args.top]:
        shown_ms += ms
        hint = sorted(hints)[0] if len(hints) == 1 else f"{len(hints)} producers"
        print(f"  {ms:7.3f} ms x{cnt:<4d} {b / 1e6:9.1f} MB  {sig}")
        print(f"{'':14s} <- {hint}")
    rest = ranked[args.top:]
    if rest:
        print(f"  {sum(r[0] for _, r in rest):7.3f} ms  "
              f"(+{len(rest)} more signatures, "
              f"{sum(r[1] for _, r in rest)} events, "
              f"{sum(r[2] for _, r in rest) / 1e6:.0f} MB)")
    print(f"\n top-{args.top} coverage: {shown_ms:.2f} / {total_ms:.2f} ms "
          f"({100 * shown_ms / max(total_ms, 1e-9):.0f}%)")

    if args.ops:
        singles = []
        for e in events:
            a = e.get("args", {})
            cat = str(a.get("hlo_category", ""))
            if not any(c in cat.lower() for c in LAYOUT_CATS):
                continue
            singles.append((float(e.get("dur", 0)) / 1000.0, e.get("name"),
                            str(a.get("long_name", ""))[:160]))
        singles.sort(reverse=True)
        print("\n largest individual events:")
        for ms, name, ln in singles[:10]:
            print(f"  {ms:7.3f} ms  {name}  {ln}")


if __name__ == "__main__":
    main()
