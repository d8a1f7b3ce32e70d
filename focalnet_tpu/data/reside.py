"""RESIDE-ITS paired data pipeline, TPU-feedable.

Behavioral spec: ``/root/reference/ITS/data/data_load.py`` and
``data_augment.py`` — directory layout ``{root}/{split}/hazy/*.png`` with the
GT pairing rule **hazy name ``.split('_')[0] + '.png'`` under ``gt/``**
(RESIDE naming ``8_1_0.9.png`` -> ``8.png``, ``data_load.py:69-70``),
extension whitelist png/jpg/jpeg (``:82-87``), paired random crop 256 +
paired horizontal flip for training (``:15-21``), batch-1 sequential loading
for valid/test (``:32-53``).

TPU-native design: no torch DataLoader.  Decode + augment run in a
thread pool (PIL releases the GIL for decode), batches are assembled as
numpy NHWC float32 in [0, 1] and prefetched ahead of the device.  The
training iterator yields dense ``(B, crop, crop, 3)`` arrays — static shapes,
jit-friendly.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Tuple

import numpy as np

_EXTS = ("png", "jpg", "jpeg")


def _check_images(names: List[str]) -> None:
    for x in names:
        if x.split(".")[-1] not in _EXTS:
            raise ValueError(f"non-image file in hazy dir: {x!r}")


def _load_image(path: str) -> np.ndarray:
    """float32 RGB (H, W, 3) in [0, 1]; native C++ decode when built, PIL
    otherwise.  PNG (the RESIDE format) decodes bit-identically on both
    paths (test_native_decode_matches_pil); JPEG may differ by +-1 LSB
    across libjpeg builds."""
    from focalnet_tpu.data import native_loader

    if native_loader.native_available():
        try:
            return native_loader.decode_image(path)
        except (IOError, RuntimeError):
            pass  # e.g. image larger than the decode buffer — PIL handles it
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def _load_image_u8(path: str) -> np.ndarray:
    """uint8 RGB (H, W, 3) — the serving upload format.  Inference paths ship
    uint8 to the device and normalize there with fp32 ``x / 255`` (4x less
    host->device traffic; <=1 ulp vs the host float decode at model input —
    XLA rewrites /255 into a reciprocal multiply, invisible after output
    quantization; test_device_u8_normalize_within_1ulp).  Decoded
    bytes are identical to :func:`_load_image`'s pre-normalization pixels on
    both the native and PIL paths."""
    from focalnet_tpu.data import native_loader

    if native_loader.native_available():
        try:
            return native_loader.decode_image_u8(path)
        except (IOError, RuntimeError):
            pass  # stale .so without the symbol, oversized image, ...
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


class ResideDataset:
    """Paired hazy/GT dataset with the RESIDE pairing rule."""

    def __init__(self, image_dir: str):
        self.image_dir = image_dir
        self.image_list = sorted(os.listdir(os.path.join(image_dir, "hazy")))
        _check_images(self.image_list)

    def __len__(self):
        return len(self.image_list)

    def gt_name(self, hazy_name: str) -> str:
        return hazy_name.split("_")[0] + ".png"

    def load_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        name = self.image_list[idx]
        hazy = _load_image(os.path.join(self.image_dir, "hazy", name))
        gt = _load_image(os.path.join(self.image_dir, "gt", self.gt_name(name)))
        return hazy, gt, name


def paired_random_crop(img, label, size: int, rng: np.random.Generator):
    h, w = img.shape[:2]
    if h < size or w < size:  # pad if needed (PairRandomCrop pad_if_needed)
        ph, pw = max(0, size - h), max(0, size - w)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
        label = np.pad(label, ((0, ph), (0, pw), (0, 0)))
        h, w = img.shape[:2]
    i = int(rng.integers(0, h - size + 1))
    j = int(rng.integers(0, w - size + 1))
    return img[i : i + size, j : j + size], label[i : i + size, j : j + size]


def paired_hflip(img, label, rng: np.random.Generator, p: float = 0.5):
    if rng.random() < p:
        return img[:, ::-1], label[:, ::-1]
    return img, label


class TrainLoader:
    """Shuffled, augmented, prefetched training iterator.

    Yields (hazy, gt) numpy arrays of shape (batch, crop, crop, 3).  Epoch
    length = len(dataset) // batch (partial batches dropped to keep shapes
    static — the only deliberate deviation from the reference's torch loader,
    which pads the last batch; noted for parity accounting).
    """

    def __init__(self, path: str, batch_size: int, num_workers: int = 8,
                 crop: int = 256, seed: int = 1234, prefetch: int = 4,
                 backend: str = "auto"):
        self.ds = ResideDataset(os.path.join(path, "train"))
        self.batch_size = batch_size
        self.crop = crop
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch_rng = np.random.default_rng(seed)
        if backend == "auto":
            from focalnet_tpu.data.native_loader import native_available

            backend = "native" if native_available() else "pil"
        self.backend = backend

    def __len__(self):
        return len(self.ds) // self.batch_size

    def _make_example(self, idx: int, seed: int):
        rng = np.random.default_rng(seed)
        hazy, gt, _ = self.ds.load_pair(idx)
        hazy, gt = paired_random_crop(hazy, gt, self.crop, rng)
        hazy, gt = paired_hflip(hazy, gt, rng)
        return hazy, gt

    def epoch(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._epoch_rng.permutation(len(self.ds))
        seeds = self._epoch_rng.integers(0, 2**31, size=len(self.ds))
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch_native(idxs, batch_seeds):
            from focalnet_tpu.data.native_loader import load_pair_batch

            hazy_paths = [
                os.path.join(self.ds.image_dir, "hazy", self.ds.image_list[i])
                for i in idxs
            ]
            gt_paths = [
                os.path.join(self.ds.image_dir, "gt",
                             self.ds.gt_name(self.ds.image_list[i]))
                for i in idxs
            ]
            return load_pair_batch(
                hazy_paths, gt_paths, self.crop,
                np.asarray(batch_seeds, np.uint64), self.num_workers,
            )

        def producer():
            with ThreadPoolExecutor(self.num_workers) as ex:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if self.backend == "native":
                        hazy, gt = make_batch_native(idxs, seeds[idxs])
                    else:
                        pairs = list(
                            ex.map(self._make_example, idxs, seeds[idxs])
                        )
                        hazy = np.stack([p[0] for p in pairs])
                        gt = np.stack([p[1] for p in pairs])
                    q.put((hazy, gt))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class EvalLoader:
    """Sequential batch-1 loader over the test split (valid/test semantics,
    ``data_load.py:32-53``).  Yields (hazy, gt, name) with hazy/gt at native
    resolution, shape (1, H, W, 3)."""

    def __init__(self, path: str, split: str = "test"):
        self.ds = ResideDataset(os.path.join(path, split))

    def __len__(self):
        return len(self.ds)

    def __iter__(self):
        for i in range(len(self.ds)):
            hazy, gt, name = self.ds.load_pair(i)
            yield hazy[None], gt[None], name


def make_synthetic_dataset(root: str, n_train: int = 8, n_test: int = 4,
                           hw: Tuple[int, int] = (256, 256), seed: int = 0):
    """Write a tiny RESIDE-layout dataset of random images (for tests/bench:
    the real ITS data is not shipped).  Hazy images are a hazed transform of
    the GT so models can actually learn the mapping."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    H, W = hw
    for split, n in [("train", n_train), ("test", n_test)]:
        hazy_dir = os.path.join(root, split, "hazy")
        gt_dir = os.path.join(root, split, "gt")
        os.makedirs(hazy_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(n):
            gt = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
            # simple atmospheric-scattering haze: I = J*t + A*(1-t)
            t = rng.uniform(0.5, 0.9)
            A = rng.uniform(0.7, 1.0)
            for k in range(1, 3):  # several hazy versions per GT
                hazy = gt * t + A * (1 - t)
                Image.fromarray((gt * 255).astype(np.uint8)).save(
                    os.path.join(gt_dir, f"{i}.png")
                )
                Image.fromarray((hazy * 255).astype(np.uint8)).save(
                    os.path.join(hazy_dir, f"{i}_{k}_{t:.1f}.png")
                )
    return root
