"""CLI entry point (``/root/reference/ITS/main.py``).

Usage:
    python -m focalnet_tpu.main --mode train --data_dir dataset/ITS
    python -m focalnet_tpu.main --mode test --test_model results/weights/Best

Flags mirror the reference's argparse surface (``main.py:62-87``) plus
``--preset`` (replacing the reference's edit-and-snapshot variant workflow,
SURVEY.md §5.6) and TPU-specific mesh options.  The reference's "code
snapshotting" (``main.py:93-102``) is replaced by recording the full config as
JSON next to the results — reproducible without copying sources.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random

import numpy as np


def main(args):
    # seeding (``main.py:11-14``): python/numpy seeds + jax PRNG from cfg.seed
    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax

    from focalnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # A stale JAX_PLATFORMS (e.g. a TPU-plugin alias that failed to register
    # in this process) would otherwise abort; fall back to auto-selection.
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"warning: backend init failed ({e}); falling back to auto")
        jax.config.update("jax_platforms", "")
        if jax.default_backend() == "cpu":
            # the cache dir was chosen for the TPU path; XLA:CPU AOT entries
            # must go to the host-fingerprinted dir (cross-host segfaults)
            from focalnet_tpu.utils.cache import use_cpu_cache

            use_cpu_cache()
    import jax.numpy as jnp

    from focalnet_tpu.configs import PRESETS, TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.utils import model_flops
    from focalnet_tpu.utils.flops import mimounet_scan_flops

    overrides = {}
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.ssm_out_dtype:
        overrides["ssm_out_dtype"] = args.ssm_out_dtype
    if args.vssg_dim:
        overrides["vssg_dim"] = args.vssg_dim
    if args.ssm_d_state:
        overrides["ssm_d_state"] = args.ssm_d_state
    if args.scan_backend:
        overrides["scan_backend"] = args.scan_backend

    # mesh: "" -> auto DP over all devices dividing the batch; "N" -> DP
    # over N devices; "N,M" -> dp x sp (batch on data, SS2D scans
    # sequence-sharded on seq — kernel-backed, parallel/seq_scan.py)
    mesh_shape = tuple(int(s) for s in args.mesh_shape.split(",") if s) or None
    mesh_axes = ("data",) if not mesh_shape or len(mesh_shape) == 1 else ("data", "seq")
    seq_mesh = None
    seq_overrides = overrides
    if mesh_shape and len(mesh_shape) > 1:
        from focalnet_tpu.parallel import make_mesh

        seq_mesh = make_mesh(mesh_shape, mesh_axes)
        seq_overrides = dict(overrides, seq_axis="seq", data_axis="data")

    # `model` is mesh-free: its forward runs at ANY batch (param init,
    # flops report, validation, --mode test/convert — all batch-1 paths).
    # `seq_model` shards SS2D scans over the seq axis; its shard_map
    # requires the batch divisible by the data-axis size, so it is used
    # only where that holds (the train step; sharded infer batches).
    # Both have identical parameter trees.
    model = build_net(args.preset, **overrides)
    seq_model = (
        build_net(args.preset, seq_mesh=seq_mesh, **seq_overrides)
        if seq_mesh is not None
        else model
    )
    cfg = PRESETS[args.preset].replace(**seq_overrides) if seq_overrides else PRESETS[args.preset]

    train_cfg = TrainConfig(
        mesh_shape=mesh_shape,
        mesh_axes=mesh_axes,
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        num_epoch=args.num_epoch,
        print_freq=args.print_freq,
        num_worker=args.num_worker,
        save_freq=args.save_freq,
        valid_freq=args.valid_freq,
        valid_batch=args.valid_batch,
        grad_accum=args.grad_accum,
        crop_size=args.crop_size,
        seed=args.seed,
        model_save_dir=args.model_save_dir,
    )

    os.makedirs(args.model_save_dir, exist_ok=True)
    os.makedirs(args.result_dir, exist_ok=True)
    # config snapshot (replaces the cp-based code snapshot, ``main.py:93-102``)
    with open(os.path.join(args.model_save_dir, "config.json"), "w") as f:
        json.dump(
            {"model": dataclasses.asdict(cfg),
             "train": dataclasses.asdict(train_cfg)},
            f, indent=2,
        )

    if args.flops_report:
        # params + GFLOPs at 256^2 (``main.py:37-50``)
        x = jnp.zeros((1, 256, 256, 3))
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
        n_params = sum(p.size for p in jax.tree.leaves(params))
        flops = model_flops(lambda p, x: model.apply(p, x), params, x)
        scan = 0
        if cfg.block_type == "vssg":
            scan = mimounet_scan_flops(cfg, (256, 256))
        print(f"params: {n_params/1e6:.3f}M")
        print(f"xla flops @256^2: {flops/1e9:.2f} GFLOPs"
              f" + scan {scan/1e9:.2f} GFLOPs (9BLDN model)"
              f" = {(flops+scan)/1e9:.2f} GFLOPs total")

    if args.mode == "train":
        from focalnet_tpu.train import train

        train(seq_model, cfg, train_cfg, resume=args.resume,
              log_file=os.path.join(args.model_save_dir, "train.log"),
              eval_model=model)
    elif args.mode == "test":
        from focalnet_tpu.evaluation import evaluate
        from focalnet_tpu.train import load_params

        # batch-1 protocol: use the seq model only when its data axis is
        # trivial (--mesh_shape "1,M" = sequence-parallel eval of batch-1)
        eval_net = model
        if seq_mesh is not None and seq_mesh.shape["data"] == 1:
            eval_net = seq_model
        elif seq_mesh is not None:
            print("note: --mode test is batch-1; ignoring the dp axis of "
                  "--mesh_shape (use \"1,M\" for sequence-parallel eval)")
        params = load_params(args.test_model)
        evaluate(eval_net, params, args.data_dir,
                 result_dir=args.result_dir, save_images=args.save_image)
    elif args.mode == "infer":
        if not args.input:
            raise SystemExit(
                "error: --mode infer requires --input <image file or directory>"
            )
        from focalnet_tpu.evaluation import infer
        from focalnet_tpu.train import load_params

        # --mesh_shape shards each inference batch over the data axis
        # (serving scale-out); a dp x sp shape reuses the model's seq mesh
        mesh = seq_mesh
        if mesh is None and mesh_shape:
            from focalnet_tpu.parallel import make_mesh

            mesh = make_mesh(mesh_shape, ("data",))
        params = load_params(args.test_model)
        if args.pad_factor % 32 or args.pad_factor <= 0:
            raise SystemExit(
                "error: --pad_factor must be a positive multiple of 32 "
                "(the model downsamples 3x by 2 and patch-embeds by 2)"
            )
        batch = args.valid_batch
        if mesh is not None and mesh.size > 1 and batch == 1:
            # default batch-1 cannot shard over the data axis; one image
            # per device is the natural serving batch
            batch = mesh.shape["data"]
            print(f"note: --valid_batch raised to {batch} (one image per "
                  f"'data'-axis device of --mesh_shape {args.mesh_shape})")
        infer(seq_model, params, args.input, args.result_dir,
              factor=args.pad_factor, batch_size=batch, mesh=mesh,
              tile=args.tile, tile_overlap=args.tile_overlap)
    elif args.mode == "serve":
        # resident serving loop: pay the compile/executable-load cost once,
        # then answer stdin requests at device speed (evaluation/serve.py)
        from focalnet_tpu.evaluation import serve
        from focalnet_tpu.train import load_params

        params = load_params(args.test_model)
        warm = []
        if args.warm_shapes:
            for tok in args.warm_shapes.split(","):
                h, _, w = tok.lower().partition("x")
                warm.append((int(h), int(w)))
        serve(model, params, args.result_dir, factor=args.pad_factor,
              tile=args.tile, tile_overlap=args.tile_overlap,
              batch_size=args.valid_batch, warm_shapes=warm)
    elif args.mode == "convert":
        # checkpoint migration, BOTH directions:
        #   --input <reference .pkl>  -> Orbax dir at --test_model
        #     (torch model.pkl / model_N.pkl / Best.pkl, ITS/train.py:110-131)
        #   --input <Orbax ckpt dir>  -> reference-format .pkl at --output
        #     (loadable by ITS/eval.py:16-17 unchanged)
        if not args.input:
            raise SystemExit(
                "error: --mode convert requires --input "
                "<reference .pkl | Orbax checkpoint dir>"
            )
        import jax
        import jax.numpy as jnp

        from focalnet_tpu.train.checkpoint import CheckpointManager
        from focalnet_tpu.utils.convert import load_torch_checkpoint

        if os.path.isdir(args.input):
            from focalnet_tpu.train import load_params
            from focalnet_tpu.utils.convert import save_torch_checkpoint

            out = args.output or args.input.rstrip("/") + ".pkl"
            save_torch_checkpoint(out, load_params(args.input))
            print(f"Converted {args.input} -> {out} (reference-format .pkl)")
            return

        template = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 3), jnp.float32),
        )
        params, report = load_torch_checkpoint(args.input, template)
        if report["missing"]:
            print("WARNING: %d flax leaves had no torch key (left at init):"
                  % len(report["missing"]))
            for ours, theirs in report["missing"][:10]:
                print("  %s  (expected torch key %s)" % (ours, theirs))
        if report["unused"]:
            print("WARNING: %d torch keys unused:" % len(report["unused"]))
            for k in report["unused"][:10]:
                print("  " + k)
        out = args.test_model  # destination dir (default results/weights/Best)
        ckpt = CheckpointManager(os.path.dirname(out) or ".",
                                 async_save=False)
        ckpt._save(os.path.basename(out), {"params": params})
        ckpt.wait()
        print(f"Converted {args.input} -> {out} (preset {args.preset})")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="focalnet_tpu")
    p.add_argument("--preset", type=str, default="1mlp_g2",
                   choices=["baseline", "1mlp", "1mlp_g2", "1mlp_g4"])
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test", "infer", "serve", "convert"])
    p.add_argument("--input", type=str, default="",
                   help="image file or directory for --mode infer; source "
                        "checkpoint (.pkl or Orbax dir) for --mode convert")
    p.add_argument("--output", type=str, default="",
                   help="--mode convert with an Orbax-dir input: destination "
                        ".pkl path (default <input>.pkl)")
    p.add_argument("--data_dir", type=str, default="dataset/ITS")
    # train (defaults = ``main.py:71-78``)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="accepted for CLI parity but UNUSED — the reference "
                        "also never passes it to its optimizer "
                        "(ITS/main.py:73 defines it; ITS/train.py:17 builds "
                        "Adam without weight_decay)")
    p.add_argument("--num_epoch", type=int, default=300)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--num_worker", type=int, default=8)
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--valid_freq", type=int, default=10)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step (activation HBM "
                        "scales with batch_size/grad_accum; effective batch "
                        "unchanged)")
    p.add_argument("--pad_factor", type=int, default=32,
                   help="--mode infer only: reflect-pad H, W up to multiples "
                        "of this (multiple of 32). Coarser factors (64/128/"
                        "256) collapse mixed image sizes into fewer padded "
                        "shapes, so a mixed-size directory compiles fewer "
                        "executables (each distinct shape costs a full model "
                        "compile); outputs can differ marginally near borders "
                        "(more reflect context). Eval/validation stay at the "
                        "reference's /32 protocol")
    p.add_argument("--tile", type=int, default=0,
                   help="--mode infer only: chop-based inference — process "
                        "every image as overlapping (tile, tile) crops "
                        "(multiple of 32; 0 = whole-image). ONE compiled "
                        "executable serves all image sizes and device memory "
                        "is bounded by the tile; scans see tile-local "
                        "context, so outputs differ slightly from the "
                        "whole-image forward. --valid_batch then batches "
                        "tiles")
    p.add_argument("--tile_overlap", type=int, default=32,
                   help="overlap in pixels between adjacent --tile crops, "
                        "feather-blended (default 32)")
    p.add_argument("--warm_shapes", type=str, default="",
                   help="--mode serve: comma list of HxW input sizes (e.g. "
                        "480x640,720x1280) whose whole-image forwards are "
                        "compiled before READY")
    p.add_argument("--valid_batch", type=int, default=1,
                   help=">1 batches same-size images per forward during "
                        "validation and --mode infer (same outputs; the "
                        "reference protocol is batch-1)")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--mesh_shape", type=str, default="",
                   help="device mesh, comma ints: '' = auto DP over all "
                        "devices dividing batch_size; '4' = DP over 4; "
                        "'2,4' = dp x sp (batch on data, SS2D scans "
                        "sequence-sharded over seq)")
    # test
    p.add_argument("--test_model", type=str, default="results/weights/Best")
    p.add_argument("--save_image", action="store_true")
    # dirs
    p.add_argument("--model_save_dir", type=str, default="results/weights")
    p.add_argument("--result_dir", type=str, default="results/images")
    p.add_argument("--flops_report", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="",
                   choices=["", "float32", "bfloat16"],
                   help="activation compute dtype (params stay fp32)")
    p.add_argument("--ssm_out_dtype", type=str, default="",
                   choices=["", "float32", "bfloat16"],
                   help="scan OUTPUT dtype; '' keeps the reference 'oflex' "
                        "fp32-out contract.  bfloat16 (with --compute_dtype "
                        "bfloat16) halves y/dy HBM traffic; scan state stays "
                        "fp32 either way")
    # architecture overrides (0/"" = keep the preset's value); mainly for
    # scaled-down experiments and the CPU-mesh integration tests
    p.add_argument("--vssg_dim", type=int, default=0)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--ssm_d_state", type=int, default=0)
    p.add_argument("--scan_backend", type=str, default="",
                   choices=["", "auto", "pallas", "chunked", "assoc", "ref"])
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
