"""Train-step wall-clock + device trace on the real chip.

Measures the full jitted train step (fwd + bwd + clip + adam) at the
reference recipe shape (256^2 crops, batch 4 by default), tunnel-safely:
dependent steps inside one jit, scalar pulled per timing call (CLAUDE.md —
block_until_ready does not sync through the axon tunnel).  Optionally writes
a jax.profiler trace and prints the device op-mix via utils.profiling.

Usage:
    python benchmarks/train_speed.py [--batch 4] [--iters 6] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--trace", type=str, default="")
    p.add_argument("--preset", type=str, default="1mlp_g2")
    p.add_argument("--proj_dtype", type=str, default="")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="e.g. bfloat16 — the CLI's --compute_dtype (scan "
                        "state stays fp32 by design)")
    p.add_argument("--ssm_out_dtype", type=str, default="",
                   help="scan output dtype (e.g. bfloat16; '' = fp32 oflex)")
    p.add_argument("--top", type=int, default=0,
                   help="with --trace: list the top-N ops of --bucket")
    p.add_argument("--bucket", type=str, default="layout",
                   help="bucket for --top: 'layout' or an hlo_category "
                        "substring (e.g. 'fusion', 'convolution')")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from focalnet_tpu.configs import TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer

    overrides = {}
    if args.proj_dtype:
        overrides["ssm_proj_dtype"] = args.proj_dtype
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.ssm_out_dtype:
        overrides["ssm_out_dtype"] = args.ssm_out_dtype
    model = build_net(args.preset, **overrides)
    cfg = TrainConfig(batch_size=args.batch)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (args.batch, args.hw, args.hw, 3))
    gt = jnp.clip(hazy * 1.1 - 0.02, 0, 1)
    params = jax.jit(model.init)({"params": rng}, hazy[:1])
    opt_state = tx.init(params)

    step = make_train_step(model, tx, cfg.fft_loss_weight)

    def run():
        nonlocal params, opt_state
        params, opt_state, m = step(params, opt_state, hazy, gt, rng)
        return float(m["loss"])  # scalar pull = host sync through the tunnel

    run()  # compile
    run()  # warmup
    n = args.iters
    t0 = time.time()
    for _ in range(n):
        run()
    dt = (time.time() - t0) / n
    # NOTE: per-call wall clock still includes one ~25 ms tunnel RTT — fine
    # for A/B deltas; use the trace for per-op attribution.
    print(json.dumps({
        "metric": "train_step_ms_wall",
        "batch": args.batch,
        "value": round(dt * 1000, 1),
        "img_per_sec": round(args.batch / dt, 2),
    }))

    if args.trace:
        from focalnet_tpu.utils.profiling import op_mix, parse_trace, trace

        with trace(args.trace):
            run()
        mix = op_mix(args.trace, min_us=5.0)
        print(json.dumps({"metric": "train_step_device_op_mix_ms",
                          **{k: round(v, 2) for k, v in mix.items()}}))
        if args.top:
            # name the tail: top ops of one bucket (default: the layout
            # bucket's copy/transpose/etc. ops) with scope names + counts
            pats = ("data formatting", "transpose", "copy", "bitcast",
                    "reshape", "slice", "pad") if args.bucket == "layout" \
                else (args.bucket,)
            r = parse_trace(args.trace, min_us=0.0)
            rows = [
                (name, ms, cnt, cat)
                for name, ms, cnt, cat in r["ops"]
                if any(p in f"{cat} {name}".lower() for p in pats)
            ]
            for name, ms, cnt, cat in rows[: args.top]:
                print(f"  {ms:8.3f} ms  x{cnt:<4d} [{cat}] {name}")
            rest = rows[args.top:]
            if rest:
                print(f"  {sum(m for _, m, _, _ in rest):8.3f} ms  "
                      f"(+{len(rest)} more ops, {sum(c for *_, c, _ in rest)} events)")


if __name__ == "__main__":
    main()
