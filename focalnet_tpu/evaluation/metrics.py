"""Eval metrics replicating the reference's exact protocol.

- PSNR both ways: ``10*log10(1/MSE)`` on the clamped prediction
  (``/root/reference/ITS/eval.py:54``) and the skimage formula
  (``eval.py:68``, ``valid.py:39``) — mathematically identical, both kept for
  log parity.
- SSIM via the pytorch_msssim algorithm (gaussian window 11, sigma 1.5,
  K=(0.01, 0.03), valid-mode filtering, per-image average) applied to
  **adaptive-avg-pooled** images with ``down_ratio = max(1, round(min(H, W)/256))``
  where H, W are the PADDED dims (``eval.py:55-58``) — the pooling trick must
  be reproduced exactly for metric parity (SURVEY.md §5.5).
- Reflect padding of H, W up to multiples of 32 (``eval.py:33-37``).
"""

from __future__ import annotations

import numpy as np


def pad_to_multiple(x: np.ndarray, factor: int = 32):
    """Reflect-pad (B, H, W, C) on the bottom/right to multiples of ``factor``.

    Returns (padded, (h, w)) with the original size for cropping back.
    """
    h, w = x.shape[1], x.shape[2]
    H = (h + factor) // factor * factor
    W = (w + factor) // factor * factor
    padh = H - h if h % factor != 0 else 0
    padw = W - w if w % factor != 0 else 0
    if padh or padw:
        x = np.pad(x, ((0, 0), (0, padh), (0, padw), (0, 0)), mode="reflect")
    return x, (h, w)


def psnr_mse(pred: np.ndarray, label: np.ndarray) -> float:
    """torch-style PSNR: 10*log10(1 / MSE) with data range 1."""
    mse = float(np.mean((pred.astype(np.float64) - label.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / mse)) if mse > 0 else float("inf")


def psnr_skimage(pred: np.ndarray, label: np.ndarray) -> float:
    """skimage.peak_signal_noise_ratio(data_range=1) — same formula, kept as
    a distinct entry point because the reference logs both."""
    return psnr_mse(pred, label)


def adaptive_avg_pool(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """PyTorch adaptive_avg_pool2d on (B, H, W, C): bin i covers
    [floor(i*n/m), ceil((i+1)*n/m))."""

    def pool_axis(a, axis, m):
        n = a.shape[axis]
        csum = np.cumsum(a, axis=axis, dtype=np.float64)
        csum = np.concatenate(
            [np.zeros_like(np.take(csum, [0], axis=axis)), csum], axis=axis
        )
        starts = (np.arange(m) * n) // m
        ends = np.ceil((np.arange(m) + 1) * n / m).astype(np.int64)
        hi = np.take(csum, ends, axis=axis)
        lo = np.take(csum, starts, axis=axis)
        width = (ends - starts).astype(np.float64)
        shape = [1] * a.ndim
        shape[axis] = m
        return ((hi - lo) / width.reshape(shape)).astype(a.dtype)

    x = pool_axis(x.astype(np.float64), 1, out_h)
    x = pool_axis(x, 2, out_w)
    return x.astype(np.float32)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_valid(x: np.ndarray, win: np.ndarray) -> np.ndarray:
    """Separable valid-mode gaussian filter over H, W of (B, H, W, C)."""
    from numpy.lib.stride_tricks import sliding_window_view

    # H axis
    v = sliding_window_view(x, win.size, axis=1)
    x = np.tensordot(v, win, axes=([-1], [0]))
    v = sliding_window_view(x, win.size, axis=2)
    return np.tensordot(v, win, axes=([-1], [0]))


def ssim(pred: np.ndarray, label: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, win_sigma: float = 1.5,
         K=(0.01, 0.03)) -> np.ndarray:
    """pytorch_msssim-compatible SSIM on (B, H, W, C); returns per-image
    values (size_average=False semantics, ``eval.py:55-58``)."""
    win = _gaussian_window(win_size, win_sigma)
    X = pred.astype(np.float64)
    Y = label.astype(np.float64)
    C1 = (K[0] * data_range) ** 2
    C2 = (K[1] * data_range) ** 2

    mu_x = _filter2d_valid(X, win)
    mu_y = _filter2d_valid(Y, win)
    sxx = _filter2d_valid(X * X, win) - mu_x**2
    syy = _filter2d_valid(Y * Y, win) - mu_y**2
    sxy = _filter2d_valid(X * Y, win) - mu_x * mu_y

    cs = (2 * sxy + C2) / (sxx + syy + C2)
    ssim_map = ((2 * mu_x * mu_y + C1) / (mu_x**2 + mu_y**2 + C1)) * cs
    return ssim_map.mean(axis=(1, 2, 3)).astype(np.float32)


def eval_ssim(pred: np.ndarray, label: np.ndarray, padded_hw) -> np.ndarray:
    """The reference's pooled SSIM: adaptive-avg-pool both images to
    (H/down_ratio, W/down_ratio), then SSIM.

    ``padded_hw`` must be the reference's FORMULA values
    ``((h+32)//32*32, (w+32)//32*32)`` (``eval.py:34``) — when h or w is
    already /32-aligned these exceed the true dims, so the pool target grid
    is LARGER than the image (adaptive pooling then upsamples); this quirk
    is load-bearing for metric parity on aligned crops."""
    H, W = padded_hw
    down = max(1, round(min(H, W) / 256))
    out_h, out_w = int(H / down), int(W / down)
    return ssim(
        adaptive_avg_pool(pred, out_h, out_w),
        adaptive_avg_pool(label, out_h, out_w),
    )


def save_image(pred: np.ndarray, path: str) -> None:
    """Save with the reference's +0.5/255 rounding offset before the
    truncating uint8 conversion (``eval.py:62-66``).

    PNGs go through the native C++ encoder when available (lossless at any
    compression level, so pixels are identical to PIL's; ~fast level-1
    zlib keeps the serving loop's background encode ahead of the device —
    ``infer.py``), falling back to PIL otherwise/for other formats."""
    x = np.clip(pred + 0.5 / 255.0, 0.0, 1.0)
    u8 = (x * 255).astype(np.uint8)
    if path.lower().endswith(".png") and u8.ndim == 3 and u8.shape[2] == 3:
        from focalnet_tpu.data.native_loader import encode_png

        if encode_png(path, u8):
            return
    from PIL import Image

    Image.fromarray(u8).save(path)
