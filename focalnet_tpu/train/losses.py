"""Multiscale L1 + FFT training loss (``/root/reference/ITS/train.py:58-88``).

loss = Σ_{s∈{1/4,1/2,1}} L1(pred_s, label_s)
     + 0.1 · Σ_s L1(stack(Re,Im)(FFT2(pred_s)), stack(Re,Im)(FFT2(label_s)))

Labels at 1/2 and 1/4 resolution are produced with PyTorch-style bilinear
downsampling (align_corners=False, **no antialiasing** — ``train.py:57-58``),
which differs from ``jax.image.resize`` (always antialiases when shrinking),
so :func:`bilinear_down` implements the exact half-pixel gather/lerp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _down_axis(x, axis, factor):
    """PyTorch bilinear (align_corners=False) downsample along one axis.

    out[i] = lerp(src[floor(p)], src[floor(p)+1], frac(p)),
    p = (i + 0.5) * factor - 0.5, clamped to the valid range.
    """
    n = x.shape[axis]
    m = n // factor
    pos = (np.arange(m) + 0.5) * factor - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    hi = np.clip(lo + 1, 0, n - 1)
    w = jnp.asarray((pos - np.floor(pos)).astype(np.float32))
    shape = [1] * x.ndim
    shape[axis] = m
    w = w.reshape(shape)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    return xlo * (1.0 - w) + xhi * w


def bilinear_down(x, factor: int):
    """(B, H, W, C) -> (B, H/f, W/f, C), PyTorch F.interpolate bilinear
    semantics (half-pixel centers, no antialias)."""
    x = _down_axis(x, 1, factor)
    x = _down_axis(x, 2, factor)
    return x


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def fft_l1(a, b):
    """L1 over stacked real/imag of the 2-D FFT (``train.py:65-86``).

    Mean over the (re, im) stack == mean over complex components, matching
    torch.stack((fft.real, fft.imag), -1) under L1Loss exactly.
    """
    fa = jnp.fft.fft2(a, axes=(1, 2))
    fb = jnp.fft.fft2(b, axes=(1, 2))
    return 0.5 * (l1(fa.real, fb.real) + l1(fa.imag, fb.imag))


def multiscale_loss(preds, label, fft_weight: float = 0.1):
    """preds = [out_4, out_2, out_1] (NHWC); label (B, H, W, C) in [0, 1].

    Returns (total, content, fft) — content/fft are the reference's logged
    "Pixel Loss" / "FFT Loss" scalars (``train.py:94-104``).
    """
    label2 = bilinear_down(label, 2)
    label4 = bilinear_down(label, 4)
    labels = [label4, label2, label]
    content = sum(l1(p, t) for p, t in zip(preds, labels))
    fft = sum(fft_l1(p, t) for p, t in zip(preds, labels))
    return content + fft_weight * fft, content, fft
