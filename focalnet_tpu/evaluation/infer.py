"""Inference: dehaze images without ground truth.

The reference has no GT-free path (its eval always loads paired data); this
is the production/serving entry point: load a checkpoint, reflect-pad each
image to /32, run the full-resolution output, crop, clamp, save with the
same +0.5/255 rounding offset as eval (``ITS/eval.py:62-66``).
"""

from __future__ import annotations

import os
import time
from typing import List

import jax
import numpy as np

from focalnet_tpu.evaluation.metrics import pad_to_multiple, save_image
from focalnet_tpu.utils import Adder

_EXTS = (".png", ".jpg", ".jpeg")


def _list_images(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(_EXTS)
    )


def infer(model, params, input_path: str, result_dir: str,
          factor: int = 32, batch_size: int = 1, mesh=None) -> dict:
    """Dehaze every image under ``input_path`` into ``result_dir``.

    ``batch_size > 1`` batches same-padded-shape images into one device
    forward (the validation bucket scheme, ``evaluator.py:43-83``) — but
    since the full file list is known up front, images are GROUPED by padded
    shape first rather than flushed on shape change, so a mixed-size
    directory compiles exactly one executable per distinct (batch, padded
    H, W).  Partial buckets are padded by repeating the last image (extra
    outputs discarded).  Identical outputs to batch-1.

    ``factor`` (multiple of 32): pad H, W up to multiples of this before the
    forward.  Coarser factors (64/128/256) collapse mixed image sizes into
    fewer padded shapes — fewer per-shape model compiles (each costs a full
    compile; ~1 min/shape through the axon tunnel) at the price of more
    padded compute and marginal border differences from the extra reflect
    context.  The crop back to (h, w) is unchanged.

    ``mesh`` (a ``jax.sharding.Mesh``): serving scale-out — each batch is
    sharded over the mesh's ``data`` axis (XLA moves the shards over ICI),
    so N chips each dehaze batch/N images per dispatch.  Requires
    ``batch_size`` divisible by the data-axis size.  Composes with a dp×sp
    mesh when the model was built with ``seq_mesh`` (the SS2D scans then
    shard L over ``seq`` inside each data shard).
    """
    from focalnet_tpu.data.reside import _load_image

    os.makedirs(result_dir, exist_ok=True)

    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        if "data" not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no 'data' axis")
        n_data = mesh.shape["data"]
        if batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the mesh "
                f"data-axis size {n_data} for sharded inference"
            )
        shard = NamedSharding(mesh, PartitionSpec("data"))

        fwd = jax.jit(
            lambda x: model.apply(params, x)[2],
            in_shardings=shard, out_shardings=shard,
        )
    else:

        @jax.jit
        def fwd(x):
            return model.apply(params, x)[2]

    files = _list_images(input_path)
    if not files:
        raise FileNotFoundError(f"no images under {input_path!r}")

    time_adder = Adder()

    if batch_size <= 1:
        path_batches = [[p] for p in files]
    else:
        # group paths by padded shape from the image HEADER (no pixel
        # decode), so a mixed-size directory compiles one executable per
        # distinct (batch, padded H, W)
        from PIL import Image

        by_shape: dict = {}
        for path in files:
            with Image.open(path) as im:
                w, h = im.size
            # padded dims per pad_to_multiple: unchanged when /factor-aligned,
            # else next multiple
            key = (-(-h // factor) * factor if h % factor else h,
                   -(-w // factor) * factor if w % factor else w)
            by_shape.setdefault(key, []).append(path)
        path_batches = [
            group[i : i + batch_size]
            for group in by_shape.values()
            for i in range(0, len(group), batch_size)
        ]

    def decode(paths):
        batch = []
        for path in paths:
            padded, (h, w) = pad_to_multiple(_load_image(path)[None], factor)
            batch.append((path, padded, h, w))
        return batch

    def save(pred, path, h, w):
        pred = np.clip(pred[:h, :w], 0.0, 1.0)
        save_image(pred, os.path.join(result_dir, os.path.basename(path)))

    def run(batch, saver):
        """batch: list of (path, padded, h, w) with identical padded shapes."""
        n = len(batch)
        pad = max(batch_size, 1) - n
        stack = [b[1] for b in batch] + [batch[-1][1]] * pad
        tm = time.time()
        preds = np.asarray(fwd(np.concatenate(stack, axis=0)))[:n]
        time_adder((time.time() - tm) / n)
        for pred, (path, _, h, w) in zip(preds, batch):
            saver.submit(save, pred, path, h, w)

    # pipeline host IO around the device: one thread decodes the NEXT batch
    # and one thread PNG-encodes the previous outputs while the device runs
    # the current forward (the serving loop never idles on disk)
    from concurrent.futures import ThreadPoolExecutor

    save_futs = []

    class _Saver:
        """Encode queue with BACKPRESSURE: at most ~2 batches of encodes may
        be outstanding (each pending future pins a full-res prediction in
        RAM — unbounded, a long directory with slow PNG encode would grow
        the queue without limit).  Waiting on the oldest also surfaces
        encode/write errors near where they happen instead of at the end."""

        def __init__(self, ex, max_pending):
            self.ex = ex
            self.max_pending = max(2, max_pending)

        def submit(self, *a):
            save_futs.append(self.ex.submit(*a))
            while len(save_futs) > self.max_pending:
                save_futs.pop(0).result()

    with ThreadPoolExecutor(1) as loader, ThreadPoolExecutor(1) as saver:
        sv = _Saver(saver, 2 * max(batch_size, 1))
        pending = None
        for paths in path_batches:
            nxt = loader.submit(decode, paths)
            if pending is not None:
                run(pending.result(), sv)
            pending = nxt
        if pending is not None:
            run(pending.result(), sv)
    for f in save_futs:  # surface any encode/write error
        f.result()

    print("Dehazed %d images -> %s (avg %.3fs/img)" % (
        len(files), result_dir, time_adder.average()))
    return {"count": len(files), "avg_time": time_adder.average()}
