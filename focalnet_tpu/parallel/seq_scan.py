"""Sequence-sharded selective scan — the multi-chip long-context path.

The reference scales sequence length only by serial 2048-element chunking
inside one CUDA kernel (``cusoflex/selective_scan_fwd_kernel_oflex.cuh:109-180``,
SURVEY.md §5.7).  Because the recurrence is an associative first-order op,
the TPU-native scale-out is blockwise-parallel over the sequence (the SSM
analogue of ring attention):

1. shard L over the ``seq`` mesh axis — each device holds a contiguous block;
2. each device runs the PRODUCTION kernel (`selective_scan`, Pallas on TPU)
   on its local block via the segment API, obtaining the local output and the
   local leaving state ``h_last``; its total decay ``a_prod = exp(A·Σdt)`` is
   a cheap closed-form reduction (no second scan pass);
3. one ``all_gather`` of the tiny (dim, N) aggregates over ICI, then each
   device folds the aggregates of the devices before it (after it, in
   ``reverse`` mode) into its incoming prefix state;
4. each device adds the prefix correction ``y_i += C_i · (P_i · h_prefix)``
   where ``P_i = exp(A · cumsum(dt)_i)`` — a streaming elementwise+reduce
   fusion, never materializing a (batch, dim, N, L) array in HBM.

Communication volume is O(devices · dim · N) — independent of L — so the
exchange rides ICI essentially for free next to the O(L · dim · N) local
work, and the local compute runs at full single-chip kernel speed.
Everything is differentiable: the kernel's segment VJP handles the h_last
cotangent, and shard_map transposes the all_gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from focalnet_tpu.ops.pallas_scan import DEF_CHUNK, deinterleave, interleave
from focalnet_tpu.ops.selective_scan import scan_chunk_for, selective_scan

# A/B switch for tests: wrap the prefix correction in jax.checkpoint instead
# of relying on XLA to stream it.  MEASURED WORSE and therefore off: at the
# hot shape (B=2, dim=384, N=16, Lloc=2048, pallas backend) the grad's peak
# temp is 141.5 MB plain vs 235.9 MB checkpointed — XLA's producer-consumer
# fusion already duplicates the cheap exp chain into each backward consumer
# (the (B, dim, N, Lloc) Pterm "residual" never gets a buffer; 141.5 MB is
# below even ONE 100.7 MB Pterm), while jax.checkpoint forces the recomputed
# intermediates to materialize.  Pinned by
# tests/test_parallel.py::test_seq_scan_grad_memory_streams_pterm.
_CHECKPOINT_CORR = False


def _fold_prefix(a_all, h_all, idx, ndev, reverse):
    """Compose the aggregates of the devices BEFORE this one (scan order)
    into the incoming prefix state.

    Crossing device i maps the entering state h to ``a_i * h + h_i``; the
    composition of "earlier" devices applied to h=0 is the prefix.  The loop
    is a static unroll over the (small) device count — O(ndev) work on
    (batch, dim, N) data.
    """
    order = range(ndev - 1, -1, -1) if reverse else range(ndev)
    a_c = jnp.ones_like(a_all[0])
    h_c = jnp.zeros_like(h_all[0])
    for i in order:
        take = (i > idx) if reverse else (i < idx)
        a_i = jnp.where(take, a_all[i], jnp.ones_like(a_all[i]))
        h_i = jnp.where(take, h_all[i], jnp.zeros_like(h_all[i]))
        # carry composed first, then device i: h -> a_i (a_c h + h_c) + h_i
        a_c, h_c = a_c * a_i, a_i * h_c + h_i
    return h_c


def selective_scan_seq_sharded(
    u, delta, A, B, C,
    D=None, delta_bias=None, delta_softplus=False,
    *, mesh: Mesh, axis: str = "seq", batch_axis: str = None,
    out_dtype=jnp.float32, backend="auto", chunk=None, reverse=False,
    pre_interleaved=False,
):
    """Selective scan with L sharded over ``mesh`` axis ``axis``.

    Shapes as in :mod:`focalnet_tpu.ops.scan_ref`; the LOCAL length
    L / axis_size must satisfy the chosen backend's constraints (any length
    for the chunked fallback; the Pallas kernel pads to 128-lane multiples).
    Returns y (batch, dim, L) sharded the same way.

    ``batch_axis`` additionally shards the batch dim over a second mesh axis
    (dp x sp composition on a 2-D mesh): the prefix all_gather then runs only
    within each data-shard's ``axis`` subgroup.

    ``reverse`` scans right-to-left globally: the prefix exchange folds the
    devices to the RIGHT and the correction uses the suffix decay product.
    ``pre_interleaved`` means the operands arrive in the kernel's interleaved
    chunk layout for the LOCAL length (chunks must not span devices —
    guaranteed when the layout was built with T = scan_chunk_for(L_local)).
    """
    in_dtype = u.dtype
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    batch, dim, L = u.shape
    G = B.shape[1]
    D_per = dim // G
    N = A.shape[-1]
    ndev = mesh.shape[axis]
    has_D = D is not None
    Dv = D if has_D else jnp.zeros((dim,), jnp.float32)
    biasv = (
        delta_bias if delta_bias is not None else jnp.zeros((dim,), jnp.float32)
    )

    def body(u, delta, A, B, C, Dv, biasv):
        Lloc = u.shape[-1]
        # h0 built FROM a varying input (not a fresh constant) so the
        # chunked fallback's lax.scan carry is varying over the manual axes
        # and shard_map's check_vma stays ON (cf. the tp_scan note).
        h0 = jnp.broadcast_to(
            0.0 * u[:, :, :1].astype(jnp.float32), (u.shape[0], dim, N)
        )
        y_local, h_last = selective_scan(
            u, delta, A, B, C, D=Dv, delta_bias=biasv,
            delta_softplus=delta_softplus, out_dtype=jnp.float32,
            backend=backend, chunk=chunk, reverse=reverse,
            pre_interleaved=pre_interleaved, h0=h0, return_state=True,
        )

        # post-bias/softplus dt in NATURAL sequence order
        dt = delta.astype(jnp.float32) + biasv.astype(jnp.float32)[None, :, None]
        if delta_softplus:
            dt = jax.nn.softplus(dt)
        Cn = C.astype(jnp.float32)
        if pre_interleaved:
            T = scan_chunk_for(Lloc, chunk or DEF_CHUNK)
            dt = deinterleave(dt, T)
            Cn = deinterleave(Cn, T)

        # prefix exchange: closed-form total decay + the kernel's h_last
        A32 = A.astype(jnp.float32)
        a_prod = jnp.exp(A32[None] * jnp.sum(dt, axis=-1)[..., None])
        idx = jax.lax.axis_index(axis)
        a_all = jax.lax.all_gather(a_prod, axis)  # (ndev, batch, dim, N)
        h_all = jax.lax.all_gather(h_last, axis)
        h_prefix = _fold_prefix(a_all, h_all, idx, ndev, reverse)

        # prefix correction: y_i += C_i · (P_i · h_prefix) with
        # P_i = exp(A · cumsum(dt)) (suffix cumsum in reverse mode).  The
        # (batch, G, D_per, N, Lloc) product below stays a streaming XLA
        # elementwise+reduce fusion — nothing (…, N, L)-shaped hits HBM,
        # in the forward AND under jax.grad: the exp's jaxpr residual is a
        # cheap elementwise chain from (batch, dim, Lloc) inputs, and XLA's
        # producer-consumer fusion duplicates it into each backward consumer
        # instead of allocating the Pterm buffer.  Verified via
        # compiled.memory_analysis() (see _CHECKPOINT_CORR above and
        # tests/test_parallel.py::test_seq_scan_grad_memory_streams_pterm).
        def _corr(dt, Cn, h_prefix):
            cdt = jnp.cumsum(dt, axis=-1)
            if reverse:
                cdt = jnp.sum(dt, axis=-1, keepdims=True) - cdt + dt
            A4 = A32.reshape(G, D_per, N)
            cdt4 = cdt.reshape(cdt.shape[0], G, D_per, Lloc)
            hp4 = h_prefix.reshape(h_prefix.shape[0], G, D_per, N)
            Pterm = jnp.exp(A4[None, :, :, :, None] * cdt4[:, :, :, None, :])
            return jnp.sum(
                Pterm * Cn[:, :, None, :, :] * hp4[..., None], axis=3
            ).reshape(cdt.shape[0], dim, Lloc)

        corr = (jax.checkpoint(_corr) if _CHECKPOINT_CORR else _corr)(
            dt, Cn, h_prefix)
        if pre_interleaved:
            corr = interleave(corr, T)
        return y_local + corr

    # check_vma stays ON everywhere except INTERPRETED pallas (CPU-mesh
    # tests): the kernel's out_shapes declare their varying axes and its
    # operands are pvaried up to them (ops/pallas_scan.py::_out_vma), so the
    # compiled mosaic path — the one real hardware runs — is covered by
    # shard_map's sharding-correctness check (TPU-validated:
    # tests/test_tpu_only.py::test_seq_scan_check_vma_on_pallas).  In
    # interpret mode jax's hlo_interpreter evaluates the kernel body under
    # vma typing, where kernel-internal literals aren't pvaried — a
    # tracing-metadata limitation of the interpreter only.
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    interpreted = jax.default_backend() != "tpu"
    spec_l = P(batch_axis, None, axis)
    spec_bc = P(batch_axis, None, None, axis)
    y = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=not (use_pallas and interpreted),
        in_specs=(
            spec_l, spec_l, P(None, None), spec_bc, spec_bc, P(None), P(None),
        ),
        out_specs=spec_l,
    )(u, delta, A, B, C, Dv, biasv)
    return y.astype(out_dtype if out_dtype is not None else in_dtype)
