"""Device-mesh construction and sharding helpers.

The reference has no distributed code at all (SURVEY.md §2.3) — this module
is the TPU-native parallelism layer built the JAX way: a ``jax.sharding.Mesh``
with named axes, ``NamedSharding`` annotations, and XLA-inserted collectives
over ICI.  Data parallelism = shard the batch axis over ``data``; gradient
all-reduce falls out of jit's partitioner (no hand-written NCCL analogue).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Tuple[str, ...] = ("data",)) -> Mesh:
    """Build a mesh over all visible devices.  ``shape=None`` puts every
    device on the first axis."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    assert n <= len(devices), (shape, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a GLOBAL batch from per-process local data (multi-host DP).

    On a single process this is equivalent to :func:`shard_batch`; on a
    multi-host pod each process passes only ITS shard of the global batch and
    jax stitches the global array (the TPU-native replacement for the
    reference's per-worker torch DataLoader, SURVEY.md §2.3 row "DP").

    The multi-process branch is covered by a REAL 2-process ``jax.distributed``
    smoke test (Gloo collectives over 4+4 virtual CPU devices):
    ``tests/test_parallel.py::test_multihost_data_parallel_train_step`` runs
    this function on per-process batch halves through a full DP train step
    and matches the single-process loss.
    """
    import jax

    sh = batch_sharding(mesh, axis)

    def place(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(place, batch)
