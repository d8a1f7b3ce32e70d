"""Serving throughput: end-to-end `infer()` over a directory on the real chip.

The reference's eval loop is its de-facto serving path (per-image forward,
``ITS/eval.py:39-45``); ours is ``focalnet_tpu.evaluation.infer``, which
buckets images by padded shape, batches each bucket, and pipelines host IO
(PNG decode ahead / encode behind) around the device forward.  This bench
measures the whole loop — decode + pad + device forward + crop + encode —
in images/sec, for a sweep of batch sizes, against the device-only figure
from ``bench.py``.

Wall-clock here is legitimate (unlike per-op timing, CLAUDE.md): the metric
IS end-to-end host time for a directory, one sync per batch.

Usage:
    python benchmarks/infer_speed.py [--n 32] [--hw 256] [--batches 1,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32, help="number of images")
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--batches", type=str, default="1,4,8")
    p.add_argument("--preset", type=str, default="1mlp_g2")
    p.add_argument("--vssg_dim", type=int, default=0,
                   help="override VSSG dim (tiny smoke runs)")
    p.add_argument("--ssm_d_state", type=int, default=0)
    p.add_argument("--scan_backend", type=str, default="")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from PIL import Image

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from focalnet_tpu.evaluation import infer
    from focalnet_tpu.models import build_net

    overrides = {}
    if args.vssg_dim:
        overrides["vssg_dim"] = args.vssg_dim
    if args.ssm_d_state:
        overrides["ssm_d_state"] = args.ssm_d_state
    if args.scan_backend:
        overrides["scan_backend"] = args.scan_backend
    model = build_net(args.preset, **overrides)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (1, args.hw, args.hw, 3))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x0)

    root = tempfile.mkdtemp(prefix="infer_bench_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    rng = np.random.RandomState(0)
    for i in range(args.n):
        arr = (rng.rand(args.hw, args.hw, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(src, "img%03d.png" % i))

    try:
        for bs in [int(b) for b in args.batches.split(",")]:
            out = os.path.join(root, "out%d" % bs)
            infer(model, params, src, out, batch_size=bs)  # compile + warm
            shutil.rmtree(out)
            t0 = time.time()
            infer(model, params, src, out, batch_size=bs)
            dt = time.time() - t0
            print(json.dumps({
                "metric": "infer_e2e_images_per_sec",
                "batch_size": bs,
                "value": round(args.n / dt, 2),
                "unit": "img/s",
                "n_images": args.n,
                "hw": args.hw,
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
