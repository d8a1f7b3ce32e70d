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
          factor: int = 32) -> dict:
    """Dehaze every image under ``input_path`` into ``result_dir``."""
    from focalnet_tpu.data.reside import _load_image

    os.makedirs(result_dir, exist_ok=True)

    @jax.jit
    def fwd(x):
        return model.apply(params, x)[2]

    files = _list_images(input_path)
    if not files:
        raise FileNotFoundError(f"no images under {input_path!r}")
    time_adder = Adder()
    for path in files:
        img = _load_image(path)[None]
        padded, (h, w) = pad_to_multiple(img, factor)
        tm = time.time()
        pred = np.asarray(fwd(padded))
        time_adder(time.time() - tm)
        pred = np.clip(pred[:, :h, :w], 0.0, 1.0)
        save_image(pred[0], os.path.join(result_dir, os.path.basename(path)))
    print("Dehazed %d images -> %s (avg %.3fs/img)" % (
        len(files), result_dir, time_adder.average()))
    return {"count": len(files), "avg_time": time_adder.average()}
