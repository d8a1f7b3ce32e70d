"""Backend dispatcher for the selective scan.

Plays the role of the reference's forward-type / kernel-variant dispatch
(``/root/reference/ITS/models/vmamba_layers.py:129-196,442-451`` selecting
between ``selective_scan_cuda_{core,oflex,ndstate,nrow}``).  On TPU every
variant collapses onto one implementation family:

- ``"pallas"``  — the production TPU kernel (covers "core"/"oflex" semantics;
                  fp32 output from bf16 inputs = oflex's ``out_float``).
- ``"chunked"`` — pure-JAX blockwise scan (the kernel's math spec; also the
                  CPU/interpret fallback, analogous to the reference's pure
                  PyTorch fallback path).
- ``"assoc"``   — ``lax.associative_scan`` oracle.
- ``"ref"``     — sequential ``lax.scan`` oracle.
- ``"matrix"``  — the reference's chunk-matrix (tril-mask) formulation
                  (``test_selective_scan_easy.py:391-466,594``); MXU-mapped
                  but measured 5.6x slower than the Pallas VPU kernel at the
                  hot shape — see :mod:`focalnet_tpu.ops.scan_matrix`.

The reference's "ndstate" specialization (N == 1, K3 in SURVEY.md §2.2) needs
no special-casing here: pass ``A`` with a trailing state axis of 1 and
``B``/``C`` as (batch, G, 1, L).  The "nrow" channel-blocking variant (K4,
disabled in the reference build) corresponds to the kernel's channel-block
grid dimension and is likewise free.
"""

from __future__ import annotations

import jax

from focalnet_tpu.ops.pallas_scan import (
    DEF_CHUNK,
    deinterleave,
    interleave,
    scan_chunk_for,
    selective_scan_pallas,
)
from focalnet_tpu.ops.scan_chunked import selective_scan_chunked
from focalnet_tpu.ops.scan_matrix import selective_scan_matrix
from focalnet_tpu.ops.scan_ref import selective_scan_assoc, selective_scan_ref

BACKENDS = ("auto", "pallas", "chunked", "assoc", "ref", "matrix")


def _default_backend():
    return "pallas" if jax.default_backend() == "tpu" else "chunked"


def selective_scan(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    delta_bias=None,
    delta_softplus=False,
    out_dtype=None,
    backend="auto",
    chunk=None,
    reverse=False,
    pre_interleaved=False,
    h0=None,
    return_state=False,
    y_accum=None,
):
    """Selective scan with automatic backend choice.

    Shapes as in :mod:`focalnet_tpu.ops.scan_ref`.  ``out_dtype=None`` means
    fp32 (the oflex contract the live model uses via forward_type "v4").
    ``chunk`` tunes the pallas backend's grid chunk (ignored elsewhere).
    ``reverse=True`` scans right-to-left — natively in the pallas kernel,
    by flip/scan/flip on the oracle backends.
    ``pre_interleaved=True`` means u/delta/B/C arrive — and y is returned —
    in the pallas kernel's interleaved chunk layout (see
    :func:`focalnet_tpu.ops.pallas_scan.interleave`); oracle backends shim
    it with deinterleave/re-interleave so callers stay backend-agnostic.
    ``h0`` (batch, dim, N) seeds the recurrence; ``return_state=True`` also
    returns the leaving state h_last (batch, dim, N) — the segment API used
    by the sequence-sharded multi-chip scan.  States are layout/direction
    invariant: h0/h_last are plain (batch, dim, N) on every backend.
    ``y_accum`` (same shape/layout as the returned y) is added into y — in
    the kernel epilogue on the pallas backend, as a plain add elsewhere.
    """
    if backend == "auto":
        backend = _default_backend()
    if y_accum is not None and backend != "pallas":
        out = selective_scan(
            u, delta, A, B, C, D=D, delta_bias=delta_bias,
            delta_softplus=delta_softplus, out_dtype=out_dtype,
            backend=backend, chunk=chunk, reverse=reverse,
            pre_interleaved=pre_interleaved, h0=h0, return_state=return_state,
        )
        if return_state:
            return out[0] + y_accum, out[1]
        return out + y_accum
    kwargs = dict(
        D=D, delta_bias=delta_bias, delta_softplus=delta_softplus,
        out_dtype=out_dtype or jax.numpy.float32,
    )
    if backend == "pallas":
        if chunk is not None:
            kwargs["chunk"] = chunk
        return selective_scan_pallas(
            u, delta, A, B, C, reverse=reverse,
            pre_interleaved=pre_interleaved, h0=h0,
            return_state=return_state, y_accum=y_accum, **kwargs,
        )
    if pre_interleaved:
        T = scan_chunk_for(u.shape[-1], chunk or DEF_CHUNK)
        d = lambda x: deinterleave(x, T)
        out = selective_scan(
            d(u), d(delta), A, d(B), d(C),
            backend=backend, chunk=chunk, reverse=reverse,
            h0=h0, return_state=return_state, **kwargs,
        )
        if return_state:
            return interleave(out[0], T), out[1]
        return interleave(out, T)
    if reverse:
        flip = lambda x: jax.numpy.flip(x, axis=-1)
        out = selective_scan(
            flip(u), flip(delta), A, flip(B), flip(C),
            backend=backend, chunk=chunk, h0=h0, return_state=return_state,
            **kwargs,
        )
        if return_state:
            return flip(out[0]), out[1]
        return flip(out)
    kwargs["h0"] = h0
    kwargs["return_last_state"] = return_state
    if backend == "chunked":
        return selective_scan_chunked(u, delta, A, B, C, **kwargs)
    if backend == "matrix":
        if chunk is not None:
            kwargs["chunk"] = chunk
        return selective_scan_matrix(u, delta, A, B, C, **kwargs)
    if backend == "assoc":
        return selective_scan_assoc(u, delta, A, B, C, **kwargs)
    if backend == "ref":
        return selective_scan_ref(u, delta, A, B, C, **kwargs)
    raise ValueError(f"unknown backend {backend!r}; expected one of {BACKENDS}")
