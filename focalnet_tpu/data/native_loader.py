"""ctypes binding for the native C++ data loader.

The reference's data path runs in torch DataLoader worker processes with PIL
decode (``/root/reference/ITS/data/data_load.py``); here the hot host-side
path (decode + paired augment + batch assembly) is a C++ library
(``native/dataloader/loader.cpp``) bound via ctypes — pybind11 is not in this
image.  Falls back to the pure-PIL pipeline when the library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "dataloader",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfocalnet_loader.so")

_lib = None


def _build_lib() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    Always invokes ``make`` (a no-op when the .so is current) so a stale
    pre-change library is rebuilt when loader.cpp grows new symbols —
    otherwise e.g. ``fnl_decode_image_u8`` would silently never activate
    (ADVICE r3).
    """
    global _lib
    if _lib is not None:
        return _lib
    if not _build_lib() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fnl_decode_image.restype = ctypes.c_int
    lib.fnl_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fnl_load_pair_batch.restype = ctypes.c_int
    lib.fnl_load_pair_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    if hasattr(lib, "fnl_encode_png"):  # absent in pre-r3 builds of the .so
        lib.fnl_encode_png.restype = ctypes.c_int
        lib.fnl_encode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
    if hasattr(lib, "fnl_decode_image_u8"):  # absent in older .so builds
        lib.fnl_decode_image_u8.restype = ctypes.c_int
        lib.fnl_decode_image_u8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_image(path: str, max_h: int = 4096, max_w: int = 4096) -> np.ndarray:
    """Decode one image to float32 RGB (H, W, 3) in [0, 1] via the C++ path."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = np.empty((max_h, max_w, 3), np.float32)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.fnl_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h, max_w, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_image_u8(path: str, max_h: int = 4096, max_w: int = 4096) -> np.ndarray:
    """Decode one image to uint8 RGB (H, W, 3) via the C++ path — the serving
    upload format (device-side x/255 normalization; see ``fnl_decode_image_u8``
    in loader.cpp)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fnl_decode_image_u8"):
        raise RuntimeError("native u8 decode unavailable")
    buf = np.empty((max_h, max_w, 3), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.fnl_decode_image_u8(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_h, max_w, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"native u8 decode failed ({rc}): {path}")
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def load_pair_batch(hazy_paths: List[str], gt_paths: List[str], crop: int,
                    seeds: np.ndarray, num_threads: int = 4):
    """Decode + paired-augment a batch: returns (hazy, gt) float32
    (n, crop, crop, 3) arrays."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(hazy_paths)
    hz = (ctypes.c_char_p * n)(*[p.encode() for p in hazy_paths])
    gt = (ctypes.c_char_p * n)(*[p.encode() for p in gt_paths])
    seeds = np.ascontiguousarray(seeds, np.uint64)
    out_h = np.empty((n, crop, crop, 3), np.float32)
    out_g = np.empty((n, crop, crop, 3), np.float32)
    rc = lib.fnl_load_pair_batch(
        hz, gt, n, crop,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"native batch load failed ({rc})")
    return out_h, out_g


def encode_png(path: str, rgb_u8: np.ndarray, level: int = 1) -> bool:
    """Write uint8 RGB (H, W, 3) as PNG via the C++ encoder.

    PNG is lossless at every compression level, so decoded pixels are
    identical to PIL's output; level 1 trades file size for encode speed
    (the serving path PNG-encodes behind the device forward — see
    ``evaluation/infer.py``).  Returns False when the native library (or
    the symbol, for a stale .so) is unavailable — caller falls back to PIL.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "fnl_encode_png"):
        return False
    arr = np.ascontiguousarray(rgb_u8, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    rc = lib.fnl_encode_png(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.shape[0], arr.shape[1], level,
    )
    return rc == 0
