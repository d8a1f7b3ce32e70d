"""Sequence-sharded selective scan — the multi-chip long-context path.

The reference scales sequence length only by serial 2048-element chunking
inside one CUDA kernel (SURVEY.md §5.7).  Because the recurrence is an
associative first-order op, the TPU-native scale-out is blockwise-parallel
over the sequence (the SSM analogue of ring attention):

1. shard L over the ``seq`` mesh axis — each device holds a contiguous block;
2. each device computes its local (a_prod, h_local) monoid aggregate
   (:func:`focalnet_tpu.ops.scan_chunked.chunk_aggregates`);
3. one ``all_gather`` of the tiny (dim, N) aggregates over ICI, then each
   device folds the aggregates of the devices to its left into its incoming
   prefix state;
4. each device finishes its local scan seeded with that prefix.

Communication volume is O(devices * dim * N) — independent of L — so the
exchange rides ICI essentially for free next to the O(L * dim) local work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from focalnet_tpu.ops.scan_chunked import _combine
from focalnet_tpu.ops.scan_ref import _expand_groups, _prepare


def _local_block(dA, dBu, C, axis_name: str):
    """Per-device body: local aggregate -> prefix exchange -> seeded scan."""
    # local monoid aggregate over this device's L-block
    a_scan, b_scan = jax.lax.associative_scan(_combine, (dA, dBu), axis=-1)
    a_tot, h_tot = a_scan[..., -1], b_scan[..., -1]  # (batch, dim, N)

    # gather every device's aggregate (tiny) and fold those left of us
    idx = jax.lax.axis_index(axis_name)
    a_all = jax.lax.all_gather(a_tot, axis_name)  # (ndev, batch, dim, N)
    h_all = jax.lax.all_gather(h_tot, axis_name)
    ndev = a_all.shape[0]

    def fold(carry, i):
        a_c, h_c = carry
        take = i < idx
        a_i = jnp.where(take, a_all[i], jnp.ones_like(a_all[i]))
        h_i = jnp.where(take, h_all[i], jnp.zeros_like(h_all[i]))
        # left-to-right composition: carry ∘ (a_i, h_i)
        a_c, h_c = _combine((a_c, h_c), (a_i, h_i))
        return (a_c, h_c), None

    (a_pre, h_pre), _ = jax.lax.scan(
        fold,
        (jnp.ones_like(a_tot), jnp.zeros_like(h_tot)),
        jnp.arange(ndev),
    )

    # finish the local scan seeded with the incoming prefix state
    h = b_scan + a_scan * h_pre[..., None]
    y = jnp.sum(h * C, axis=-2)  # (batch, dim, T_local)
    return y


def selective_scan_seq_sharded(
    u, delta, A, B, C,
    D=None, delta_bias=None, delta_softplus=False,
    *, mesh: Mesh, axis: str = "seq", batch_axis: str = None,
    out_dtype=jnp.float32,
):
    """Selective scan with L sharded over ``mesh`` axis ``axis``.

    Shapes as in :mod:`focalnet_tpu.ops.scan_ref`; L must divide the axis
    size.  Returns y (batch, dim, L) sharded the same way.

    ``batch_axis`` additionally shards the batch dim over a second mesh axis
    (dp x sp composition on a 2-D mesh): the prefix all_gather then runs only
    within each data-shard's ``axis`` subgroup.
    """
    in_dtype = u.dtype
    u, delta, A, B, C, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    batch, dim, L = u.shape
    Bx = _expand_groups(B, dim)
    Cx = _expand_groups(C, dim)

    dA = jnp.exp(delta[..., None, :] * A[None, :, :, None])  # (batch, dim, N, L)
    dBu = delta[..., None, :] * Bx * u[..., None, :]

    spec = P(batch_axis, None, None, axis)
    body = functools.partial(_local_block, axis_name=axis)
    y = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(batch_axis, None, axis),
    )(dA, dBu, Cx)

    if D is not None:
        y = y + u * D[None, :, None]
    return y.astype(out_dtype if out_dtype is not None else in_dtype)
