"""Tensor-parallel (channel-sharded) selective scan.

The scan recurrence is independent per (channel, state) pair, so tensor
parallelism over the channel dimension needs NO collectives inside the op:
each device runs the Pallas kernel on its channel shard.  This is the TP
building block for sharding SS2D's d_inner over a ``model`` mesh axis
(SURVEY.md §2.3 row "Tensor parallel"); the surrounding projections are plain
matmuls that GSPMD partitions automatically from the parameter shardings.

Two sharding granularities:

- **whole-group** (``G % axis_size == 0``): each shard keeps complete B/C
  groups and the matching channel rows — zero replication.
- **sub-group** (``G < axis_size``, the live-model case: G=2 direction
  groups x d_inner=192 channels each): B/C are replicated over the axis and
  the per-group channel block ``D_per`` is sharded instead
  (``D_per % axis_size == 0``).  B/C are tiny next to u/delta, so the
  replication is noise while the O(L·dim·N) scan splits n ways — this is
  what :class:`focalnet_tpu.models.ss2d.SS2D` uses when ``tp_axis`` is set.

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
    *, mesh: Mesh, axis: str = "model", batch_axis: str = None,
    out_dtype=None, backend="auto", chunk=None, reverse=False,
    pre_interleaved=False, y_accum=None,
):
    """Channel-sharded selective scan over mesh axis ``axis``.

    Shapes as in :mod:`focalnet_tpu.ops.scan_ref`.  Picks whole-group or
    sub-group sharding automatically (see module docstring).  ``batch_axis``
    additionally shards the batch dim over a second mesh axis (dp x tp on a
    2-D mesh).  ``chunk``/``reverse``/``pre_interleaved``/``y_accum`` pass
    through to the local kernel call (the layout knobs are along L, which TP
    never touches, so they compose freely).
    """
    n_shard = mesh.shape[axis]
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    G = B.shape[1]
    dim = u.shape[1]
    N = A.shape[-1]
    D_per = dim // G
    has_D = D is not None
    Dv = D if has_D else jnp.zeros((dim,), jnp.float32)
    biasv = delta_bias if delta_bias is not None else jnp.zeros((dim,), jnp.float32)

    def local(u, delta, A, B, C, D, bias, y_acc):
        # flatten a possible (B, G, D_loc, L) sub-group view back to channels
        sub = u.ndim == 4
        if sub:
            b, g, d_loc, l = u.shape
            u = u.reshape(b, g * d_loc, l)
            delta = delta.reshape(b, g * d_loc, l)
            A = A.reshape(g * d_loc, -1)
            D = D.reshape(-1)
            bias = bias.reshape(-1)
            if y_acc is not None:
                y_acc = y_acc.reshape(b, g * d_loc, l)
        # h0 derived from a varying input so the chunked fallback's lax.scan
        # carry is varying over the manual axes — keeps check_vma ON
        h0 = jnp.broadcast_to(
            0.0 * u[:, :, :1].astype(jnp.float32),
            (u.shape[0], u.shape[1], A.shape[-1]),
        )
        y = selective_scan(
            u, delta, A, B, C, D=D, delta_bias=bias,
            delta_softplus=delta_softplus, out_dtype=out_dtype,
            backend=backend, chunk=chunk, reverse=reverse,
            pre_interleaved=pre_interleaved, y_accum=y_acc, h0=h0,
        )
        return y.reshape(b, g, d_loc, l) if sub else y

    # check_vma OFF only for INTERPRETED pallas (CPU-mesh tests): the
    # kernel's out_shapes/operands now carry/lift vma (see the note in
    # seq_scan.py), so the compiled mosaic path keeps shard_map's
    # sharding-correctness check ON; the chunked/oracle paths always kept
    # it ON (their lax.scan carry is made varying via the explicit h0 above).
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    check = not (use_pallas and jax.default_backend() != "tpu")

    if G % n_shard == 0:
        # whole-group sharding: channels, A rows, D, bias follow the groups
        y = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=check,
            in_specs=(
                P(batch_axis, axis, None),        # u: channels sharded
                P(batch_axis, axis, None),        # delta
                P(axis, None),                    # A rows follow channels
                P(batch_axis, axis, None, None),  # B: whole groups per shard
                P(batch_axis, axis, None, None),  # C
                P(axis),                          # D skip
                P(axis),                          # delta_bias
                None if y_accum is None else P(batch_axis, axis, None),
            ),
            out_specs=P(batch_axis, axis, None),
        )(u, delta, A, B, C, Dv, biasv, y_accum)
        return y

    if D_per % n_shard != 0:
        raise ValueError(
            f"TP needs G ({G}) or D_per ({D_per}) divisible by {axis}={n_shard}"
        )
    # sub-group sharding: expose (B, G, D_per, L), shard D_per, replicate B/C
    bsz, L = u.shape[0], u.shape[-1]
    u4 = u.reshape(bsz, G, D_per, L)
    d4 = delta.reshape(bsz, G, D_per, L)
    A3 = A.reshape(G, D_per, N)
    Dv3 = Dv.reshape(G, D_per)
    bias3 = biasv.reshape(G, D_per)
    ya4 = None if y_accum is None else y_accum.reshape(bsz, G, D_per, L)
    spec4 = P(batch_axis, None, axis, None)
    y = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=check,
        in_specs=(
            spec4,                             # u
            spec4,                             # delta
            P(None, axis, None),               # A
            P(batch_axis, None, None, None),   # B: replicated over model axis
            P(batch_axis, None, None, None),   # C
            P(None, axis),                     # D skip
            P(None, axis),                     # delta_bias
            None if y_accum is None else spec4,
        ),
        out_specs=spec4,
    )(u4, d4, A3, B, C, Dv3, bias3, ya4)
    return y.reshape(bsz, dim, L)
