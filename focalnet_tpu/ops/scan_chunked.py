"""Chunked (blockwise) selective scan — the spec for the Pallas kernel and
for the sequence-sharded multi-chip scan.

Mirrors the math of the reference's chunked CUDA kernel
(``/root/reference/kernels/selective_scan/csrc/selective_scan/cusoflex/selective_scan_fwd_kernel_oflex.cuh:109-180``
— 2048-element chunks with an (a, b) running prefix carried across chunks) and
its pure-math spec (``kernels/selective_scan/test_selective_scan_easy.py:14-97``),
but built on the stable pair monoid rather than the exp-rescaling trick: within
a chunk we scan pairs ``(a_i, b_i) = (exp(dt_i A), dt_i B_i u_i)`` with

    (a2, b2) ∘ (a1, b1) = (a1 a2, a1 b2 + b1)   [left-to-right composition]

where every ``a`` lies in (0, 1] (A < 0), so no intermediate can overflow.
Across chunks, the carried state is just ``h_prefix`` (batch, dim, N).

This module is pure jax.numpy: it is the *oracle for blockwise correctness*
(the Pallas kernel computes the identical chunk decomposition inside VMEM) and
the building block for sequence sharding (each device runs chunks locally and
exchanges (a_prod, h_local) aggregates over ICI — see
``focalnet_tpu/parallel/seq_scan.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from focalnet_tpu.ops.scan_ref import _expand_groups, _prepare


def _combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def chunk_scan(dA, dBu, h_prefix):
    """Scan one chunk given precomputed dA=exp(dt*A), dBu=dt*B*u.

    Args:
      dA, dBu: (..., N, T) chunk inputs.
      h_prefix: (..., N) incoming state.
    Returns:
      h: (..., N, T) states at every position in the chunk (prefix applied).
    """
    a_scan, b_scan = jax.lax.associative_scan(_combine, (dA, dBu), axis=-1)
    # prefix contribution: h_i = b_scan_i + (prod of a up to i) * h_prefix
    return b_scan + a_scan * h_prefix[..., None]


def selective_scan_chunked(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    return_last_state=False,
    out_dtype=jnp.float32,
    chunk=64,
    h0=None,
):
    """Chunked selective scan: lax.scan over chunks, associative scan within.

    ``h0`` (batch, dim, N) seeds the recurrence (segment API)."""
    in_dtype = u.dtype
    u, delta, A, B, C, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    batch, dim, L = u.shape
    N = A.shape[1]
    if L % chunk != 0:
        pad = chunk - L % chunk
        # pad with dt=0 => a=1, b=0: identity elements of the monoid
        u_p = jnp.pad(u, ((0, 0), (0, 0), (0, pad)))
        delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))
        B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad)))
        C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad)))
    else:
        u_p, delta_p, B_p, C_p = u, delta, B, C
    Lp = u_p.shape[-1]
    n_chunks = Lp // chunk

    Bx = _expand_groups(B_p, dim)  # (batch, dim, N, L)
    Cx = _expand_groups(C_p, dim)

    dA = jnp.exp(delta_p[..., None, :] * A[None, :, :, None])  # (batch, dim, N, Lp)
    dBu = delta_p[..., None, :] * Bx * u_p[..., None, :]

    # reshape to (n_chunks, batch, dim, N, chunk)
    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape(*x.shape[:-1], n_chunks, chunk), -2, 0
        )

    dA_c, dBu_c, C_c = to_chunks(dA), to_chunks(dBu), to_chunks(Cx)

    def step(h_prefix, inputs):
        dA_i, dBu_i, C_i = inputs
        h = chunk_scan(dA_i, dBu_i, h_prefix)
        y = jnp.sum(h * C_i, axis=-2)  # (batch, dim, chunk)
        return h[..., -1], y

    h0 = (
        jnp.zeros((batch, dim, N), jnp.float32)
        if h0 is None else h0.astype(jnp.float32)
    )
    h_last, ys = jax.lax.scan(step, h0, (dA_c, dBu_c, C_c))
    y = jnp.moveaxis(ys, 0, -2).reshape(batch, dim, Lp)[..., :L]
    if D is not None:
        y = y + u * D[None, :, None]
    out = y.astype(out_dtype if out_dtype is not None else in_dtype)
    if return_last_state:
        return out, h_last
    return out


def chunk_aggregates(dA, dBu):
    """Per-chunk monoid aggregate for cross-device prefix exchange.

    Args:
      dA, dBu: (..., N, T).
    Returns:
      (a_prod, h_local): both (..., N) — the chunk's total decay product and
      its local (zero-prefix) final state.  Composing aggregates left-to-right
      with ``_combine`` yields exclusive prefixes for each chunk; the
      multi-chip scan exchanges these tiny aggregates over ICI (one
      all_gather + a linear fold in :mod:`focalnet_tpu.parallel.seq_scan` —
      O(devices) work on O(dim*N) data, negligible next to the O(L*dim)
      local scans at any realistic device count).
    """
    a_scan, b_scan = jax.lax.associative_scan(_combine, (dA, dBu), axis=-1)
    return a_scan[..., -1], b_scan[..., -1]
