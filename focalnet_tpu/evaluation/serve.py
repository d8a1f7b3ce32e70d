"""Warm serving loop: dehaze images on demand over a line protocol.

Short-lived CLI invocations pay the executable compile/load cost on every
start — through a remote-device link the big-shape executables alone cost
~a minute per process (BASELINE.md, tunnel rows).  A resident server pays
it ONCE and then answers each request at device speed.  The reference has
no serving entry at all (``ITS/eval.py`` is a batch script); this is the
production-serving surface the TPU build adds on top of ``--mode infer``.

Protocol (stdin -> stdout, one request per line):

    <input_path>[TAB<output_path>]

responds with one line per request, flushed immediately:

    OK<TAB><output_path>        the dehazed image was written
    ERR<TAB><message>           the request failed; the server keeps serving

``READY`` is printed once the model is warm (in ``--tile`` mode the single
tile executable is pre-compiled before READY; whole-image mode compiles per
new padded shape on first use, or ahead of time via ``warm_shapes``).  EOF
or an empty line ends the loop.
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional, Tuple

import jax
import numpy as np

from focalnet_tpu.evaluation.infer import _pad_to_min, tiled_forward
from focalnet_tpu.evaluation.metrics import pad_to_multiple, save_image
from focalnet_tpu.utils import Adder


def serve(model, params, result_dir: str, factor: int = 32,
          tile: int = 0, tile_overlap: int = 32, batch_size: int = 1,
          warm_shapes: Optional[List[Tuple[int, int]]] = None,
          inp=None, out=None) -> dict:
    """Run the serving loop (see module docstring for the protocol).

    ``tile``/``tile_overlap``/``batch_size`` as in :func:`..infer.infer`'s
    chop mode — recommended for mixed-size production traffic (exactly one
    executable).  ``warm_shapes`` [(h, w), ...] pre-compiles whole-image
    forwards for known input sizes before READY.  ``inp``/``out`` default to
    stdin/stdout (injectable for tests).
    """
    from focalnet_tpu.data.reside import _load_image_u8

    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout
    os.makedirs(result_dir, exist_ok=True)

    # uint8 upload + on-device fp32 x/255 — <=1 ulp vs host-side float
    # decode at 1/4 the host->device traffic (see infer.py)
    def _apply(p, x):
        import jax.numpy as jnp

        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return model.apply(p, x)[2]

    fwd = jax.jit(_apply)

    def respond(*fields):
        out.write("\t".join(fields) + "\n")
        out.flush()

    if tile:
        if tile % 32:
            raise ValueError(f"tile must be a multiple of 32, got {tile}")
        if not 0 <= tile_overlap < tile:
            raise ValueError(f"tile_overlap must be in [0, tile), got {tile_overlap}")
        bs = max(batch_size, 1)
        tile_fwd = lambda x: fwd(params, x)
        # warm the one-and-only executable before declaring READY (uint8
        # input signature — the dtype requests see)
        np.asarray(tile_fwd(np.zeros((bs, tile, tile, 3), np.uint8)))
    for h, w in warm_shapes or []:
        padded = (-(-h // factor) * factor if h % factor else h,
                  -(-w // factor) * factor if w % factor else w)
        np.asarray(fwd(params, np.zeros((1, *padded, 3), np.uint8)))

    respond("READY")
    served, time_adder = 0, Adder()
    for line in inp:
        line = line.rstrip("\n")
        if not line.strip():
            break
        src, _, dst = line.partition("\t")
        if not dst:
            dst = os.path.join(result_dir, os.path.basename(src))
        try:
            img = _load_image_u8(src)  # (H, W, 3) uint8
            h, w = img.shape[:2]
            tm = time.time()
            if tile:
                pred = tiled_forward(
                    tile_fwd, _pad_to_min(img, tile, tile), tile,
                    tile_overlap, bs,
                )
            else:
                padded, _ = pad_to_multiple(img[None], factor)
                pred = np.asarray(fwd(params, padded))[0]
            time_adder(time.time() - tm)
            save_image(np.clip(pred[:h, :w], 0.0, 1.0), dst)
            served += 1
            respond("OK", dst)
        except Exception as e:  # keep serving; the client sees the cause
            respond("ERR", f"{type(e).__name__}: {e}")
    return {"count": served,
            "avg_time": time_adder.average() if served else 0.0}
