"""Chunk-matrix ("tril-mask" / SSD-style) selective scan.

The reference ships this formulation twice as math specs:
``selective_scan_easyv2`` (`/root/reference/kernels/selective_scan/
test_selective_scan_easy.py:391-466`) and the autograd wrapper
``SelectiveScanMatrix`` (`:594-930`).  Per T-chunk it computes the
intra-chunk outputs as dense masked matmuls instead of a scan:

    s_l   = cumsum(dt)_l                     (inclusive, per channel d)
    w     = exp(A[d,n] * s_l[d])             (decay to the chunk origin)
    M[l,r,d] = sum_n  C_l[n] * w[l,n,d] * B_r[n] / w[r,n,d]
    y1[l,d]  = sum_{r<=l}  M[l,r,d] * (dt*u)[r,d]        (tril-masked)
    y0[l,d]  = sum_n  C_l[n] * w[l,n,d] * h0[n,d]
    h_out    = w[-1] * (h0 + sum_l B_l[n]*(dt*u)[l,d] / w[l,n,d])

with ``h0`` carried across chunks by a ``lax.scan`` (identical chunk
decomposition to :mod:`focalnet_tpu.ops.scan_chunked`).

Why it exists here, and why it is NOT the production path
---------------------------------------------------------
The M-build / M-apply contractions are matmuls, i.e. the one formulation of
the S6 recurrence that can run on the MXU instead of the VPU.  Measured on
the live TPU v5e at the model's hot shape (D=768 channels, N=16, chunk
T=128; ``benchmarks/mxu_probe.py``, trace-timed):

    square control   (D,T,T)@(D,T,T)  180-187 TF/s   (the MXU itself is fine)
    M-build          (D,T,N)@(D,N,T)   28.5 TF/s bf16 (K=16 -> 12.5% depth)
    M-apply matvec   (D,T,T)@(D,T,1)    0.65 TF/s     (value dim 1)

In S6 the decay ``w`` depends jointly on the state n AND the channel d
(``A`` is (dim, N) and ``dt`` is per-channel), so every channel owns its own
(T, T) kernel matrix: the apply is a per-channel mat*VEC*, value dimension
exactly 1 — unlike SSD/Mamba-2 where A is scalar per head and M is shared
across the head's channels.  At L=16384 that means per forward call:
M-build 128 chunks x 0.014 ms = 1.79 ms, M-apply 128 x 0.039 ms = 5.0 ms —
>= 6.8 ms of matmul time alone against the 1.21 ms TOTAL of the production
Pallas VPU scan, before the (L, N, D)-shaped elementwise w/k/q tensors (16x
the production kernel's pass volume) are paid for.  The per-element flop
count tells the same story: the matrix form spends 2*N*T + 2*T = 4352 flops
per (d, l) element (T=128) where the linear scan spends ~9*N = 144 — a 30x
inflation that the MXU's 12.5%-utilized skinny matmuls cannot buy back.

Kept as a spec/alternative backend (parity-tested against the oracle) and as
the committed record of the MXU-formulation decision; see BASELINE.md round 5
for the full A/B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from focalnet_tpu.ops.scan_ref import _expand_groups, _prepare

DEF_MATRIX_CHUNK = 64  # the reference spec's default (test_selective_scan_easy.py:391)


def selective_scan_matrix(
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
    chunk=DEF_MATRIX_CHUNK,
    h0=None,
    precision="highest",
):
    """Tril-mask matrix-form selective scan (shapes as in scan_ref).

    Numerics note (inherent to the factored formulation, reference included):
    the chunk-local decay is split into ``w`` and ``1/w`` factors so the
    (l, r) pair matrix is a rank-N matmul; the factors overflow fp32 beyond
    a bounded exponent range even though every KEPT (r <= l) product is
    bounded.  This implementation centers the exponents on the chunk
    midpoint (the reference anchors at the chunk origin), doubling the
    domain to ``max|A| * max_chunk_sum(dt) < ~160``.  Beyond that, shrink
    ``chunk`` (adversarial test inputs use 16).  The monoid-based backends
    have no such limit — one more reason this stays a spec backend.
    """
    in_dtype = u.dtype
    u, delta, A, B, C, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    batch, dim, L = u.shape
    N = A.shape[1]
    if chunk < 1:
        chunk = L
    if L % chunk != 0:
        pad = chunk - L % chunk
        # dt = 0 pads are identity elements: w extends flat, v = 0
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad)))
        C = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad)))
    Lp = u.shape[-1]
    n_chunks = Lp // chunk

    Bx = _expand_groups(B, dim)  # (batch, dim, N, Lp)
    Cx = _expand_groups(C, dim)

    def to_chunks(x):  # (..., Lp) -> (n_chunks, ..., chunk)
        return jnp.moveaxis(x.reshape(*x.shape[:-1], n_chunks, chunk), -2, 0)

    u_c, dt_c = to_chunks(u), to_chunks(delta)
    B_c, C_c = to_chunks(Bx), to_chunks(Cx)
    mask = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    def ss_chunk(h, inputs):
        cu, cdt, ck, cq = inputs  # (batch, dim, T) / (batch, dim, N, T)
        s = jnp.cumsum(cdt, axis=-1)  # inclusive, (batch, dim, T)
        # Center the factored exponents on the chunk midpoint: every kept
        # (r <= l) product q_mul_w[l]*k_div_w[r] = q*k*exp(A*(s_l - s_r)) is
        # unchanged (the s_mid factors cancel), but each factor's exponent
        # range halves, doubling the fp32 stability domain vs the reference's
        # origin-anchored w (which 0*inf-NaNs KEPT entries once
        # max|A|*sum(dt) > ~88 — softplus pushes small raw dt to ~0.7, so
        # chunk=64 sat right at that edge).
        s_mid = s[..., chunk // 2, None]  # (batch, dim, 1)
        w = jnp.exp(A[None, :, :, None] * (s - s_mid)[:, :, None, :])
        # exp(A*s_mid): negative exponent only — underflow is benign decay
        w_mid = jnp.exp(A[None, :, :, None] * s_mid[:, :, None, :])[..., 0]
        v = cu * cdt  # (batch, dim, T)
        k_div_w = ck / w
        q_mul_w = cq * w

        # h0-independent: the MXU contractions of the formulation
        #   M[l, r] = sum_n q_mul_w[n, l] * k_div_w[n, r]   per (batch, dim)
        # Masked (r > l) entries have POSITIVE exponents A*(s_l - s_r) and can
        # reach inf before masking — select, don't multiply (inf * 0 = nan).
        # precision: the reference computes the whole form in fp32
        # (SelectiveScanMatrix casts via custom_fwd(cast_inputs=float32));
        # "highest" keeps the MXU contractions fp32-accurate for parity.
        M = jnp.einsum("bdnl,bdnr->bdlr", q_mul_w, k_div_w, precision=precision)
        y1 = jnp.einsum("bdlr,bdr->bdl", jnp.where(mask != 0, M, 0.0), v,
                        precision=precision)
        h1 = w[..., -1] * jnp.einsum("bdnr,bdr->bdn", k_div_w, v,
                                     precision=precision)
        # h0-dependent (h0 folded through the midpoint shift: exp(A*s_l) =
        # w[l] * w_mid)
        h_eff = w_mid * h
        y0 = jnp.einsum("bdnl,bdn->bdl", q_mul_w, h_eff, precision=precision)
        h0_out = w[..., -1] * h_eff
        return h0_out + h1, y1 + y0

    h = (
        jnp.zeros((batch, dim, N), jnp.float32)
        if h0 is None else h0.astype(jnp.float32)
    )
    # Rematerialize the chunk body under AD: the reference's manual backward
    # saves only the per-chunk h prefixes (`ohs`, SelectiveScanMatrix:676-679)
    # and recomputes w/k/q per chunk — without this, AD would keep every
    # chunk's (batch, dim, T, T) masked M alive (~6.4 GB at the hot shape).
    h_last, ys = jax.lax.scan(jax.checkpoint(ss_chunk), h, (u_c, dt_c, B_c, C_c))
    y = jnp.moveaxis(ys, 0, -2).reshape(batch, dim, Lp)[..., :L]
    if D is not None:
        y = y + u[..., :L] * D[None, :, None]
    out = y.astype(out_dtype if out_dtype is not None else in_dtype)
    if return_last_state:
        return out, h_last
    return out
