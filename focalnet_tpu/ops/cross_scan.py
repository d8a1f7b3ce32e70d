"""4-direction cross scan / merge as XLA layout ops.

The reference implements these as Triton kernels
(``/root/reference/ITS/models/csm_triton.py:7-160``) and as PyTorch autograd
fallbacks (``ITS/models/vmamba_layers.py:29-71``).  On TPU they are pure data
movement — reshape/transpose/flip/stack — which XLA fuses into neighbouring
ops, so no custom kernel is needed (SURVEY.md §2.2 T1).  Gradients come for
free from JAX autodiff (cross_scan and cross_merge are mutually adjoint, which
is exactly how the reference pairs their fwd/bwd).

Directions (row-major H×W grid, L = H*W):
    0: row-major raster           (h, w) -> h*W + w
    1: column-major raster        (h, w) -> w*H + h   (transpose then flatten)
    2: reversed row-major         flip of 0
    3: reversed column-major      flip of 1

All functions use channel-last grids (B, H, W, C) — the TPU-native conv layout
— and produce/consume (B, K=4, L, C) sequence stacks (L innermost-major for
the projection matmuls; the Pallas kernel transposes to (B, K, C, L) at its
boundary).
"""

from __future__ import annotations

import jax.numpy as jnp

K_DIRS = 4


def cross_scan(x):
    """(B, H, W, C) -> (B, 4, L, C) with the 4 raster directions."""
    B, H, W, C = x.shape
    d0 = x.reshape(B, H * W, C)
    d1 = jnp.swapaxes(x, 1, 2).reshape(B, W * H, C)
    d2 = jnp.flip(d0, axis=1)
    d3 = jnp.flip(d1, axis=1)
    return jnp.stack([d0, d1, d2, d3], axis=1)


def cross_merge(ys, H, W):
    """(B, 4, L, C) -> (B, H, W, C): sum the 4 directions mapped back to the grid.

    Mirrors CrossMerge (``vmamba_layers.py:50-58``): flip directions 2/3 back,
    un-transpose direction 1's stream, and sum.
    """
    B, K, L, C = ys.shape
    assert K == K_DIRS and L == H * W
    fwd = ys[:, 0] + jnp.flip(ys[:, 2], axis=1)  # (B, L, C) row-major
    rev = ys[:, 1] + jnp.flip(ys[:, 3], axis=1)  # (B, L, C) column-major
    rev = jnp.swapaxes(rev.reshape(B, W, H, C), 1, 2).reshape(B, L, C)
    return (fwd + rev).reshape(B, H, W, C)


def cross_scan_1b1(x):
    """Per-direction cross scan: (B, 4, H, W, C) -> (B, 4, L, C).

    Each of the 4 input streams gets its own direction applied (the Triton
    ``_1b1`` semantics, ``csm_triton.py:83-160``): stream k is rastered in
    direction k rather than broadcasting one input to all four.
    """
    B, K, H, W, C = x.shape
    assert K == K_DIRS
    d0 = x[:, 0].reshape(B, H * W, C)
    d1 = jnp.swapaxes(x[:, 1], 1, 2).reshape(B, W * H, C)
    d2 = jnp.flip(x[:, 2].reshape(B, H * W, C), axis=1)
    d3 = jnp.flip(jnp.swapaxes(x[:, 3], 1, 2).reshape(B, W * H, C), axis=1)
    return jnp.stack([d0, d1, d2, d3], axis=1)


def cross_merge_1b1(ys, H, W):
    """Inverse of cross_scan_1b1 per stream, no summation: -> (B, 4, H, W, C)."""
    B, K, L, C = ys.shape
    assert K == K_DIRS and L == H * W
    d0 = ys[:, 0].reshape(B, H, W, C)
    d1 = jnp.swapaxes(ys[:, 1].reshape(B, W, H, C), 1, 2)
    d2 = jnp.flip(ys[:, 2], axis=1).reshape(B, H, W, C)
    d3 = jnp.swapaxes(jnp.flip(ys[:, 3], axis=1).reshape(B, W, H, C), 1, 2)
    return jnp.stack([d0, d1, d2, d3], axis=1)
