"""Pallas TPU selective-scan kernel (forward + custom-VJP backward).

TPU-native replacement for the reference's CUDA extension
(``/root/reference/kernels/selective_scan/csrc/selective_scan/cusoflex/`` —
chunked forward with a carried prefix, reverse-chunk backward with
recomputation from saved chunk states; SURVEY.md §2.2 K1–K4).  Everything is
re-derived for the TPU memory/compute model rather than translated:

- The sequence L is processed in lane-aligned chunks of T (a grid dimension,
  innermost), with the running state h (D_blk, N) carried in a VMEM scratch
  across grid steps — the analogue of the CUDA kernel's cross-chunk prefix
  handoff through shared memory.
- Within a chunk, the first-order recurrence
  ``h_i = a_i h_{i-1} + b_i``, ``(a_i, b_i) = (exp(dt_i A), dt_i B_i u_i)``
  is computed by an O(log T) Hillis–Steele scan over the pair monoid using
  lane rotations (``pltpu.roll``) + masking on the VPU.  All ``a`` values lie
  in (0, 1] (A < 0), so the scan is numerically stable with no rescaling
  tricks — the same property the CUDA CUB BlockScan relies on.
- State and accumulation are fp32 regardless of input dtype, and the output
  may be fp32 from bf16 inputs (the "oflex" ``out_float`` contract,
  ``cusoflex/selective_scan_oflex.cpp:164,234-240``).
- The backward pass runs the chunk grid in REVERSE (via index maps), carries
  the adjoint state ``G`` in scratch, and rematerializes per-position h from
  the per-chunk entering states saved by the forward — the TPU version of the
  CUDA backward's reverse-chunk loop + BlockReverseScan.

Layout: channels on sublanes, sequence on lanes —
    u, delta, y : (B, G, D, L)      A: (G, D, N)     B, C: (B, G, N, L)

N (d_state) is unrolled as a small python loop (N=16 for the live model;
N=1 recovers the reference's "ndstate" specialization K3 for free).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_CHUNK = 512


def _interpret():
    """Run the kernel in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"


def _pair_scan_fwd(a, b, col_ids, T):
    """Inclusive scan of (a, b) pairs along lanes (axis 1), left-to-right.

    Returns (a_scan, b_scan): a_scan_i = prod_{j<=i} a_j,
    b_scan_i = sum_{j<=i} (prod_{j<k<=i} a_k) b_j.
    """
    shift = 1
    while shift < T:
        a_sh = pltpu.roll(a, shift, 1)
        b_sh = pltpu.roll(b, shift, 1)
        mask = col_ids >= shift
        b = jnp.where(mask, b + a * b_sh, b)
        a = jnp.where(mask, a * a_sh, a)
        shift *= 2
    return a, b


def _pair_scan_rev(a_next, g, col_ids, T):
    """Inclusive right-to-left scan: g_i = e_i + a_next_i * g_{i+1} composed.

    a_next_i multiplies the incoming suffix from position i+1; positions
    rolled in from beyond the chunk are masked out.
    """
    shift = 1
    while shift < T:
        # left-roll by `shift` == circular right-roll by T - shift (masked anyway)
        a_sh = pltpu.roll(a_next, T - shift, 1)
        g_sh = pltpu.roll(g, T - shift, 1)
        mask = col_ids < (T - shift)
        g = jnp.where(mask, g + a_next * g_sh, g)
        a_next = jnp.where(mask, a_next * a_sh, a_next)
        shift *= 2
    return g


def _compute_dt(delta_ref, bias_ref, softplus):
    dt = delta_ref[0, 0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if softplus:
        dt = jax.nn.softplus(dt)
    return dt


def _fwd_kernel(
    u_ref, delta_ref, A_ref, B_ref, C_ref, D_ref, bias_ref,
    y_ref, hchk_ref,
    h_state,
    *, N, T, softplus, has_D,
):
    l = pl.program_id(3)

    @pl.when(l == 0)
    def _():
        h_state[...] = jnp.zeros(h_state.shape, h_state.dtype)

    # save the state *entering* this chunk (for backward rematerialization)
    hchk_ref[0, 0, 0] = h_state[...]

    dt = _compute_dt(delta_ref, bias_ref, softplus)          # (D_blk, T)
    u = u_ref[0, 0].astype(jnp.float32)                      # (D_blk, T)
    du = dt * u
    A = A_ref[0].astype(jnp.float32)                         # (D_blk, N)
    Bm = B_ref[0, 0].astype(jnp.float32)                     # (N, T)
    Cm = C_ref[0, 0].astype(jnp.float32)                     # (N, T)

    D_blk = u.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (D_blk, T), 1)

    y_acc = jnp.zeros((D_blk, T), jnp.float32)
    for n in range(N):
        a = jnp.exp(dt * A[:, n : n + 1])                    # (D_blk, T)
        b = du * Bm[n : n + 1, :]                            # (D_blk, T)
        a_sc, b_sc = _pair_scan_fwd(a, b, col_ids, T)
        h = b_sc + a_sc * h_state[:, n : n + 1]
        y_acc = y_acc + h * Cm[n : n + 1, :]
        h_state[:, n : n + 1] = h[:, T - 1 : T]

    if has_D:
        y_acc = y_acc + D_ref[0].astype(jnp.float32) * u
    y_ref[0, 0] = y_acc.astype(y_ref.dtype)


def _bwd_kernel(
    u_ref, delta_ref, A_ref, B_ref, C_ref, D_ref, bias_ref, hchk_ref, dy_ref,
    du_ref, ddelta_ref, dA_ref, dB_ref, dC_ref, dD_ref, dbias_ref,
    g_state,
    *, N, T, softplus, has_D,
):
    # NOTE: index maps traverse chunks in reverse: grid step l handles chunk
    # (n_chunks - 1 - l).  g_state carries a_0^{(c+1)} * G_0^{(c+1)} — the
    # adjoint flowing from the chunk to the right.
    l = pl.program_id(3)

    @pl.when(l == 0)
    def _():
        g_state[...] = jnp.zeros(g_state.shape, g_state.dtype)
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)
        dD_ref[...] = jnp.zeros(dD_ref.shape, dD_ref.dtype)
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    dt_pre = delta_ref[0, 0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if softplus:
        dt = jax.nn.softplus(dt_pre)
    else:
        dt = dt_pre
    u = u_ref[0, 0].astype(jnp.float32)
    du_in = dt * u
    A = A_ref[0].astype(jnp.float32)                         # (D_blk, N)
    Bm = B_ref[0, 0].astype(jnp.float32)                     # (N, T)
    Cm = C_ref[0, 0].astype(jnp.float32)                     # (N, T)
    dy = dy_ref[0, 0].astype(jnp.float32)                    # (D_blk, T)
    h_in = hchk_ref[0, 0, 0]                                 # (D_blk, N) fp32

    D_blk = u.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (D_blk, T), 1)
    last_col = col_ids == (T - 1)

    du_acc = jnp.zeros((D_blk, T), jnp.float32)
    ddt_acc = jnp.zeros((D_blk, T), jnp.float32)
    dB_acc = jnp.zeros((N, T), jnp.float32)
    dC_acc = jnp.zeros((N, T), jnp.float32)

    for n in range(N):
        An = A[:, n : n + 1]
        a = jnp.exp(dt * An)                                 # (D_blk, T)
        b = du_in * Bm[n : n + 1, :]
        # --- rematerialize forward states h_i for this chunk ---
        a_sc, b_sc = _pair_scan_fwd(a, b, col_ids, T)
        h = b_sc + a_sc * h_in[:, n : n + 1]                 # (D_blk, T)
        h_prev = jnp.where(
            col_ids == 0,
            h_in[:, n : n + 1],
            pltpu.roll(h, 1, 1),
        )
        # --- reverse adjoint scan: G_i = C_i dy_i + a_{i+1} G_{i+1} ---
        e = Cm[n : n + 1, :] * dy
        # inject the carry from the chunk to the right at the last position
        e = jnp.where(last_col, e + g_state[:, n : n + 1], e)
        a_next = jnp.where(col_ids == (T - 1), 0.0, pltpu.roll(a, T - 1, 1))
        G = _pair_scan_rev(a_next, e, col_ids, T)            # (D_blk, T)
        # carry for the next (left) chunk: a_0 * G_0
        g_state[:, n : n + 1] = (a * G)[:, 0:1]

        Gh_a = G * h_prev * a                                # shared term
        du_acc = du_acc + G * dt * Bm[n : n + 1, :]
        ddt_acc = ddt_acc + G * u * Bm[n : n + 1, :] + Gh_a * An
        dB_acc = dB_acc + jnp.sum(G * du_in, axis=0, keepdims=True) * (
            jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) == n
        ).astype(jnp.float32)
        dC_acc = dC_acc + jnp.sum(h * dy, axis=0, keepdims=True) * (
            jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) == n
        ).astype(jnp.float32)
        dA_ref[0, 0, :, n : n + 1] += jnp.sum(Gh_a * dt, axis=1, keepdims=True)

    if has_D:
        Dv = D_ref[0].astype(jnp.float32)                    # (D_blk, 1)
        du_acc = du_acc + Dv * dy
        dD_ref[0, 0] += jnp.sum(dy * u, axis=1, keepdims=True)

    if softplus:
        ddt_pre = ddt_acc * jax.nn.sigmoid(dt_pre)
    else:
        ddt_pre = ddt_acc
    dbias_ref[0, 0] += jnp.sum(ddt_pre, axis=1, keepdims=True)

    du_ref[0, 0] = du_acc.astype(du_ref.dtype)
    ddelta_ref[0, 0] = ddt_pre.astype(ddelta_ref.dtype)
    dB_ref[0, 0] = dB_acc.astype(dB_ref.dtype)
    dC_ref[0, 0] = dC_acc.astype(dC_ref.dtype)


def _pick_chunk(L, chunk):
    """Largest lane-aligned chunk size dividing L (after padding to 128)."""
    for T in (chunk, 512, 256, 128):
        if T <= chunk and L % T == 0:
            return T
    return 128


def _pad_L(x, Lp):
    pad = Lp - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def _scan_core(u, delta, A, B, C, Dskip, delta_bias, softplus, has_D, out_dtype, chunk):
    y, _ = _scan_fwd_impl(u, delta, A, B, C, Dskip, delta_bias, softplus, has_D, out_dtype, chunk)
    return y


def _scan_fwd_impl(u, delta, A, B, C, Dskip, delta_bias, softplus, has_D, out_dtype, chunk):
    Bsz, G, D, L = u.shape
    N = A.shape[-1]
    T = _pick_chunk(L, chunk)
    Lp = pl.cdiv(L, T) * T
    nL = Lp // T
    u_p, delta_p = _pad_L(u, Lp), _pad_L(delta, Lp)
    B_p, C_p = _pad_L(B, Lp), _pad_L(C, Lp)
    A3 = A.reshape(G, D, N)
    D3 = Dskip.reshape(G, D, 1)
    bias3 = delta_bias.reshape(G, D, 1)

    grid = (Bsz, G, 1, nL)
    kernel = functools.partial(_fwd_kernel, N=N, T=T, softplus=softplus, has_D=has_D)
    y, hchk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, T), lambda b, g, d, l: (b, g, d, l)),  # u
            pl.BlockSpec((1, 1, D, T), lambda b, g, d, l: (b, g, d, l)),  # delta
            pl.BlockSpec((1, D, N), lambda b, g, d, l: (g, d, 0)),        # A
            pl.BlockSpec((1, 1, N, T), lambda b, g, d, l: (b, g, 0, l)),  # B
            pl.BlockSpec((1, 1, N, T), lambda b, g, d, l: (b, g, 0, l)),  # C
            pl.BlockSpec((1, D, 1), lambda b, g, d, l: (g, d, 0)),        # Dskip
            pl.BlockSpec((1, D, 1), lambda b, g, d, l: (g, d, 0)),        # bias
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D, T), lambda b, g, d, l: (b, g, d, l)),
            pl.BlockSpec((1, 1, 1, D, N), lambda b, g, d, l: (b, g, l, d, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, G, D, Lp), out_dtype),
            jax.ShapeDtypeStruct((Bsz, G, nL, D, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D, N), jnp.float32)],
        interpret=_interpret(),
    )(u_p, delta_p, A3, B_p, C_p, D3, bias3)
    return y[..., :L], hchk


def _scan_vjp_fwd(u, delta, A, B, C, Dskip, delta_bias, softplus, has_D, out_dtype, chunk):
    y, hchk = _scan_fwd_impl(u, delta, A, B, C, Dskip, delta_bias, softplus, has_D, out_dtype, chunk)
    return y, (u, delta, A, B, C, Dskip, delta_bias, hchk)


def _scan_vjp_bwd(softplus, has_D, out_dtype, chunk, res, dy):
    u, delta, A, B, C, Dskip, delta_bias, hchk = res
    Bsz, G, D, L = u.shape
    N = A.shape[-1]
    T = _pick_chunk(L, chunk)
    Lp = pl.cdiv(L, T) * T
    nL = Lp // T
    u_p, delta_p = _pad_L(u, Lp), _pad_L(delta, Lp)
    B_p, C_p = _pad_L(B, Lp), _pad_L(C, Lp)
    dy_p = _pad_L(dy.astype(jnp.float32), Lp)
    A3 = A.reshape(G, D, N)
    D3 = Dskip.reshape(G, D, 1)
    bias3 = delta_bias.reshape(G, D, 1)

    grid = (Bsz, G, 1, nL)
    rev = lambda b, g, d, l: (b, g, d, nL - 1 - l)
    rev_chk = lambda b, g, d, l: (b, g, nL - 1 - l, d, 0)
    rev_bc = lambda b, g, d, l: (b, g, 0, nL - 1 - l)
    kernel = functools.partial(_bwd_kernel, N=N, T=T, softplus=softplus, has_D=has_D)
    du, ddelta, dA_p, dB, dC, dD_p, dbias_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, T), rev),                               # u
            pl.BlockSpec((1, 1, D, T), rev),                               # delta
            pl.BlockSpec((1, D, N), lambda b, g, d, l: (g, d, 0)),         # A
            pl.BlockSpec((1, 1, N, T), rev_bc),                            # B
            pl.BlockSpec((1, 1, N, T), rev_bc),                            # C
            pl.BlockSpec((1, D, 1), lambda b, g, d, l: (g, d, 0)),         # Dskip
            pl.BlockSpec((1, D, 1), lambda b, g, d, l: (g, d, 0)),         # bias
            pl.BlockSpec((1, 1, 1, D, N), rev_chk),                        # hchk
            pl.BlockSpec((1, 1, D, T), rev),                               # dy
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D, T), rev),                               # du
            pl.BlockSpec((1, 1, D, T), rev),                               # ddelta
            pl.BlockSpec((1, 1, D, N), lambda b, g, d, l: (b, g, d, 0)),   # dA partial
            pl.BlockSpec((1, 1, N, T), rev_bc),                            # dB
            pl.BlockSpec((1, 1, N, T), rev_bc),                            # dC
            pl.BlockSpec((1, 1, D, 1), lambda b, g, d, l: (b, g, d, 0)),   # dD partial
            pl.BlockSpec((1, 1, D, 1), lambda b, g, d, l: (b, g, d, 0)),   # dbias partial
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, G, D, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, D, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, D, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, N, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, N, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, D, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, D, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D, N), jnp.float32)],
        interpret=_interpret(),
    )(u_p, delta_p, A3, B_p, C_p, D3, bias3, hchk, dy_p)

    du = du[..., :L].astype(u.dtype)
    ddelta = ddelta[..., :L].astype(delta.dtype)
    dA = jnp.sum(dA_p, axis=0).astype(A.dtype)
    dB = dB[..., :L].astype(B.dtype)
    dC = dC[..., :L].astype(C.dtype)
    dD = jnp.sum(dD_p, axis=(0, 3)).reshape(-1).astype(Dskip.dtype)
    dbias = jnp.sum(dbias_p, axis=(0, 3)).reshape(-1).astype(delta_bias.dtype)
    return du, ddelta, dA, dB, dC, dD, dbias


_scan_core.defvjp(_scan_vjp_fwd, _scan_vjp_bwd)


def selective_scan_pallas(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    out_dtype=jnp.float32,
    chunk=DEF_CHUNK,
):
    """Pallas selective scan with the oracle's canonical signature.

    u, delta: (batch, dim, L); A: (dim, N); B, C: (batch, G, N, L) with
    dim % G == 0; D, delta_bias: (dim,) or None.  Returns (batch, dim, L) in
    ``out_dtype`` (fp32 by default — the "oflex" contract).
    """
    batch, dim, L = u.shape
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    G = B.shape[1]
    assert dim % G == 0, (dim, G)
    D_per = dim // G
    N = A.shape[-1]

    has_D = D is not None
    Dv = D if has_D else jnp.zeros((dim,), jnp.float32)
    biasv = delta_bias if delta_bias is not None else jnp.zeros((dim,), jnp.float32)

    u4 = u.reshape(batch, G, D_per, L)
    delta4 = delta.reshape(batch, G, D_per, L)
    A4 = A.reshape(G, D_per, N)
    y = _scan_core(
        u4, delta4, A4, B, C,
        Dv.astype(jnp.float32), biasv.astype(jnp.float32),
        delta_softplus, has_D, jnp.dtype(out_dtype), chunk,
    )
    return y.reshape(batch, dim, L)
