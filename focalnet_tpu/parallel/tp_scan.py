"""Tensor-parallel (channel-sharded) selective scan.

The scan recurrence is independent per (channel, state) pair, so tensor
parallelism over the channel dimension needs NO collectives inside the op:
each device runs the Pallas kernel on its channel shard.  This is the TP
building block for sharding SS2D's d_inner over a ``model`` mesh axis
(SURVEY.md §2.3 row "Tensor parallel"); the surrounding projections are plain
matmuls that GSPMD partitions automatically from the parameter shardings.

GSPMD cannot partition a Pallas custom call by itself (it would insert
all-gathers around it), hence the explicit shard_map here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from focalnet_tpu.ops.selective_scan import selective_scan


def selective_scan_tp(
    u, delta, A, B, C,
    D=None, delta_bias=None, delta_softplus=False,
    *, mesh: Mesh, axis: str = "model", out_dtype=None, backend="auto",
):
    """Channel-sharded selective scan over mesh axis ``axis``.

    Shapes as in :mod:`focalnet_tpu.ops.scan_ref`; ``dim`` must divide the
    axis size such that each shard keeps whole B/C groups (dim_per_device %
    (dim // G) == 0 is NOT required — groups are replicated and indexed by
    the shard's channels, so we shard at group granularity: G % axis_size == 0).
    """
    n_shard = mesh.shape[axis]
    G = B.shape[1] if B.ndim == 4 else 1
    assert G % n_shard == 0, (
        f"TP shards whole B/C groups: G={G} not divisible by {axis}={n_shard}"
    )

    def local(u, delta, A, B, C, D, bias):
        # h0 derived from a varying input so the chunked fallback's lax.scan
        # carry is varying over the manual axes — keeps check_vma ON
        N = A.shape[-1]
        h0 = jnp.broadcast_to(
            0.0 * u[:, :, :1].astype(jnp.float32),
            (u.shape[0], u.shape[1], N),
        )
        return selective_scan(
            u, delta, A, B, C, D=D, delta_bias=bias,
            delta_softplus=delta_softplus, out_dtype=out_dtype,
            backend=backend, h0=h0,
        )

    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]

    dim = u.shape[1]
    has_D = D is not None
    Dv = D if has_D else jnp.zeros((dim,), jnp.float32)
    biasv = delta_bias if delta_bias is not None else jnp.zeros((dim,), jnp.float32)

    # check_vma OFF only for the Pallas path (pallas_call outputs carry no
    # varying-manual-axes info — see the same note in seq_scan.py); the
    # chunked/oracle paths keep the check ON (their lax.scan carry is made
    # varying via the explicit h0 above).
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    return jax.shard_map(
        local,
        mesh=mesh,
        check_vma=not use_pallas,
        in_specs=(
            P(None, axis, None),        # u: channels sharded
            P(None, axis, None),        # delta
            P(axis, None),              # A rows follow channels
            P(None, axis, None, None),  # B: whole groups per shard
            P(None, axis, None, None),  # C
            P(axis),                    # D skip
            P(axis),                    # delta_bias
        ),
        out_specs=P(None, axis, None),
    )(u, delta, A, B, C, Dv, biasv)
