"""Reference (oracle) selective-scan implementations in pure JAX.

The selective scan is the Mamba S6 recurrence: for each (batch, channel) pair,
with per-step discretization ``dt`` and state size N,

    h_i = exp(dt_i * A) * h_{i-1} + dt_i * B_i * u_i        (h in R^N)
    y_i = <C_i, h_i> + D * u_i

Semantics mirror the reference CUDA extension's contract
(``/root/reference/kernels/selective_scan/test_selective_scan.py:168-234`` and
``cusoflex/selective_scan_oflex.cpp:157-243``): fp32 state regardless of input
dtype, optional ``delta_bias`` added before an optional softplus, optional
``D`` skip, and ("oflex") the option of fp32 output from low-precision inputs.

Two implementations:

- :func:`selective_scan_ref` — ``lax.scan`` over L, one step at a time.  The
  slow, obviously-correct oracle every other implementation is tested against.
- :func:`selective_scan_assoc` — ``lax.associative_scan`` over the (a, b) pair
  monoid ``(a2, b2) ∘ (a1, b1) = (a1*a2, a1*b2 + b1)`` (left-to-right), the
  mathematical basis for the Pallas kernel's blockwise scan and the
  sequence-sharded multi-chip scan.

Canonical shapes (G = number of B/C groups, dim % G == 0):

    u, delta : (batch, dim, L)
    A        : (dim, N)
    B, C     : (batch, G, N, L)
    D        : (dim,) or None
    delta_bias : (dim,) or None

Returns ``y (batch, dim, L)`` and optionally the final state
``h_last (batch, dim, N)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """Common input canonicalization: fp32 compute, delta bias/softplus."""
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    if B.ndim == 3:  # (batch, N, L) -> single group
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    if D is not None:
        D = D.astype(jnp.float32)
    return u, delta, A, B, C, D


def _expand_groups(BC, dim):
    """(batch, G, N, L) -> (batch, dim, N, L) by repeating each group."""
    batch, G, N, L = BC.shape
    reps = dim // G
    return jnp.repeat(BC, reps, axis=1)


def selective_scan_ref(
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
    h0=None,
):
    """Sequential lax.scan oracle. O(L) steps; use only for tests/small shapes.

    ``h0`` (batch, dim, N) seeds the recurrence (segment API, see
    :func:`focalnet_tpu.ops.pallas_scan.selective_scan_pallas`)."""
    in_dtype = u.dtype
    u, delta, A, B, C, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    batch, dim, L = u.shape
    N = A.shape[1]
    Bx = _expand_groups(B, dim)  # (batch, dim, N, L)
    Cx = _expand_groups(C, dim)

    # scan over L: carry h (batch, dim, N)
    dA = jnp.exp(delta[..., None, :] * A[None, :, :, None])  # (batch, dim, N, L)
    dBu = delta[..., None, :] * Bx * u[..., None, :]  # (batch, dim, N, L)

    def step(h, inputs):
        dA_i, dBu_i, C_i = inputs
        h = dA_i * h + dBu_i
        y = jnp.sum(h * C_i, axis=-1)  # (batch, dim)
        return h, y

    h0 = (
        jnp.zeros((batch, dim, N), jnp.float32)
        if h0 is None else h0.astype(jnp.float32)
    )
    xs = (
        jnp.moveaxis(dA, -1, 0),  # (L, batch, dim, N)
        jnp.moveaxis(dBu, -1, 0),
        jnp.moveaxis(Cx, -1, 0),
    )
    h_last, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, -1)  # (batch, dim, L)
    if D is not None:
        y = y + u * D[None, :, None]
    out = y.astype(out_dtype if out_dtype is not None else in_dtype)
    if return_last_state:
        return out, h_last
    return out


def selective_scan_assoc(
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
    h0=None,
):
    """Vectorized oracle via lax.associative_scan over the (a, b) monoid.

    Materializes (batch, dim, N, L) intermediates — fine for tests, too much
    HBM for production (the Pallas kernel streams these through VMEM instead).
    """
    in_dtype = u.dtype
    u, delta, A, B, C, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    batch, dim, L = u.shape
    Bx = _expand_groups(B, dim)
    Cx = _expand_groups(C, dim)

    a = jnp.exp(delta[..., None, :] * A[None, :, :, None])  # (batch, dim, N, L)
    b = delta[..., None, :] * Bx * u[..., None, :]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    a_scan, h = jax.lax.associative_scan(combine, (a, b), axis=-1)
    if h0 is not None:
        # prefix application: h_i += (prod of a up to i) * h0
        h = h + a_scan * h0.astype(jnp.float32)[..., None]
    y = jnp.sum(h * Cx, axis=-2)  # (batch, dim, L)
    if D is not None:
        y = y + u * D[None, :, None]
    out = y.astype(out_dtype if out_dtype is not None else in_dtype)
    if return_last_state:
        return out, h[..., -1]
    return out
