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


def _pipeline(items, decode_fn, run_fn, save_cap: int):
    """Decode-ahead / encode-behind host-IO pipeline: one thread decodes the
    NEXT item and one thread PNG-encodes previous outputs while ``run_fn``
    drives the device on the current one — the serving loop never idles on
    disk.  ``run_fn(decoded, saver)`` submits writes via ``saver.submit``;
    the encode queue is BACKPRESSURED at ``save_cap`` pending writes (each
    pins a full-res prediction in RAM) so errors also surface near their
    cause rather than at the end."""
    from concurrent.futures import ThreadPoolExecutor

    save_futs = []

    class _Saver:
        def __init__(self, ex, max_pending):
            self.ex = ex
            self.max_pending = max(2, max_pending)

        def submit(self, *a):
            save_futs.append(self.ex.submit(*a))
            while len(save_futs) > self.max_pending:
                save_futs.pop(0).result()

    with ThreadPoolExecutor(1) as loader, ThreadPoolExecutor(1) as saver:
        sv = _Saver(saver, save_cap)
        pending = None
        for it in items:
            nxt = loader.submit(decode_fn, it)
            if pending is not None:
                run_fn(pending.result(), sv)
            pending = nxt
        if pending is not None:
            run_fn(pending.result(), sv)
    for f in save_futs:  # surface any encode/write error
        f.result()


def _tile_starts(size: int, tile: int, stride: int) -> List[int]:
    """Top/left tile offsets covering ``[0, size)`` with the given stride;
    the last tile is clamped flush to the end."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return starts


def _tile_weights(tile: int, overlap: int) -> np.ndarray:
    """(tile, tile, 1) feathered blend weights: 1 in the interior, a linear
    ramp down across the ``overlap`` margin on every side.  Overlapping tile
    outputs are averaged under these weights (sum normalized), so seams fade
    linearly instead of stepping; where only one tile covers a pixel the
    normalization makes the weight exactly 1."""
    r = np.minimum(np.arange(1, tile + 1), np.arange(tile, 0, -1))
    w1 = np.minimum(r / float(overlap + 1), 1.0).astype(np.float32)
    return (w1[:, None] * w1[None, :])[..., None]


def _pad_to_min(img: np.ndarray, min_h: int, min_w: int) -> np.ndarray:
    """Reflect-pad (H, W, C) on the bottom/right up to at least (min_h,
    min_w), in steps (np.pad 'reflect' caps each step at size-1; a size-1
    dim falls back to edge replication — reflect is undefined there)."""
    while img.shape[0] < min_h or img.shape[1] < min_w:
        ph = min(min_h - img.shape[0], max(img.shape[0] - 1, 1)) if img.shape[0] < min_h else 0
        pw = min(min_w - img.shape[1], max(img.shape[1] - 1, 1)) if img.shape[1] < min_w else 0
        mode = "reflect" if min(img.shape[0], img.shape[1]) > 1 else "edge"
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
    return img


def tiled_forward(fwd_batch, img: np.ndarray, tile: int, overlap: int,
                  batch_size: int = 1, inflight: int = 4) -> np.ndarray:
    """Dehaze ``img`` (H, W, C; H, W >= tile) as overlapping (tile, tile)
    crops forwarded through ``fwd_batch`` ((batch_size, tile, tile, C) ->
    same-shape predictions), feather-blended back together.

    This is chop-based restoration inference: every image size runs through
    ONE compiled (batch_size, tile, tile, C) executable, and device memory is
    bounded by the tile size rather than the image size.  The SS2D scans see
    one tile of context instead of the whole image, so outputs differ from
    the whole-image forward near tile interiors — opt-in for serving; the
    eval/validation protocols (``ITS/eval.py:33-37``) keep whole-image
    forwards.

    ``inflight`` tile batches are kept dispatched-but-unmaterialized (JAX
    dispatch is async): the device computes ahead while the host blends and
    — through a high-latency device link — the per-batch round trips of up
    to ``inflight`` batches overlap instead of paying RTT serially.  Blending
    stays FIFO, so outputs are bit-identical to ``inflight=0``; device-side
    live memory is bounded by ``inflight + 1`` tile batches.
    """
    from collections import deque

    H, W, _ = img.shape
    stride = tile - overlap
    coords = [
        (y, x)
        for y in _tile_starts(H, tile, stride)
        for x in _tile_starts(W, tile, stride)
    ]
    wtile = _tile_weights(tile, overlap)
    out = np.zeros(img.shape, np.float32)
    wsum = np.zeros((H, W, 1), np.float32)
    pending: deque = deque()

    def blend(preds_dev, group):
        preds = np.asarray(preds_dev)[: len(group)]
        for pred, (y, x) in zip(preds, group):
            out[y : y + tile, x : x + tile] += pred * wtile
            wsum[y : y + tile, x : x + tile] += wtile

    for i in range(0, len(coords), batch_size):
        group = coords[i : i + batch_size]
        stack = np.stack([img[y : y + tile, x : x + tile] for y, x in group])
        if len(group) < batch_size:
            stack = np.concatenate(
                [stack, np.repeat(stack[-1:], batch_size - len(group), 0)]
            )
        pending.append((fwd_batch(stack), group))
        while len(pending) > max(inflight, 0):
            blend(*pending.popleft())
    while pending:
        blend(*pending.popleft())
    return out / wsum


def infer(model, params, input_path: str, result_dir: str,
          factor: int = 32, batch_size: int = 1, mesh=None,
          tile: int = 0, tile_overlap: int = 32) -> dict:
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

    ``tile`` (multiple of 32, 0 = off): chop-based inference — every image
    is processed as overlapping (tile, tile) crops, feather-blended over
    ``tile_overlap`` pixels (:func:`tiled_forward`).  ONE executable serves
    every image size (vs one compile per distinct padded shape — ~1 min each
    through a slow link) and device memory is bounded by the tile, at the
    price of tile-local scan context (outputs near seams differ slightly
    from the whole-image forward).  ``batch_size`` then batches TILES, and
    ``mesh`` shards tile batches.
    """
    from focalnet_tpu.data.reside import _load_image_u8

    os.makedirs(result_dir, exist_ok=True)

    # images are shipped to the device as uint8 and normalized there: the
    # jitted fp32 x/255 (XLA: reciprocal multiply) is within 1 ulp of the
    # host-side decode-to-float at model input — invisible after the +0.5/255
    # output quantization — at 1/4 the host->device transfer volume (the
    # serving bottleneck over slow links; BASELINE.md tunnel rows,
    # test_device_u8_normalize_within_1ulp)
    # params are a jit ARGUMENT (not a closure): closed-over weights become
    # HLO constants, which (a) bakes ~9 MB of parameters into every serving
    # executable and (b) lets XLA constant-fold/fuse differently from the
    # identical params-as-argument computation in evaluation.serve — the two
    # paths then stop being byte-identical under XLA:CPU's fusion choices
    # (seen once as an order-dependent test_serve_mode_tiled_matches_infer
    # failure).  With the same (p, x) signature both modules trace the same
    # jaxpr, share one persistent-cache entry, and agree bit-for-bit.
    def _apply(p, x):
        import jax.numpy as jnp

        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return model.apply(p, x)[2]

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
        repl = NamedSharding(mesh, PartitionSpec())

        fwd_p = jax.jit(_apply, in_shardings=(repl, shard), out_shardings=shard)
    else:
        fwd_p = jax.jit(_apply)
    fwd = lambda x: fwd_p(params, x)

    files = _list_images(input_path)
    if not files:
        raise FileNotFoundError(f"no images under {input_path!r}")

    time_adder = Adder()

    def save(pred, path, h, w):
        pred = np.clip(pred[:h, :w], 0.0, 1.0)
        save_image(pred, os.path.join(result_dir, os.path.basename(path)))

    if tile:
        if tile % 32:
            raise ValueError(f"--tile must be a multiple of 32, got {tile}")
        if not 0 <= tile_overlap < tile:
            raise ValueError(
                f"--tile_overlap must be in [0, tile), got {tile_overlap}"
            )
        bs = max(batch_size, 1)

        def decode_one(path):
            img = _load_image_u8(path)  # (H, W, 3) uint8
            h, w = img.shape[:2]
            return path, _pad_to_min(img, tile, tile), h, w

        def run_tiled(item, saver):
            path, img, h, w = item
            tm = time.time()
            pred = tiled_forward(fwd, img, tile, tile_overlap, bs)
            time_adder(time.time() - tm)
            saver.submit(save, pred, path, h, w)

        _pipeline(files, decode_one, run_tiled, save_cap=4)
        print("Dehazed %d images -> %s (avg %.3fs/img)" % (
            len(files), result_dir, time_adder.average()))
        return {"count": len(files), "avg_time": time_adder.average()}

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
            padded, (h, w) = pad_to_multiple(_load_image_u8(path)[None], factor)
            batch.append((path, padded, h, w))
        return batch

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

    _pipeline(path_batches, decode, run, save_cap=2 * max(batch_size, 1))

    print("Dehazed %d images -> %s (avg %.3fs/img)" % (
        len(files), result_dir, time_adder.average()))
    return {"count": len(files), "avg_time": time_adder.average()}
