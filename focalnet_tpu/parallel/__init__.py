"""Mesh/sharding utilities and the sequence-sharded multi-chip scan."""

from focalnet_tpu.parallel.mesh import (
    batch_sharding,
    make_global_batch,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from focalnet_tpu.parallel.seq_scan import selective_scan_seq_sharded
from focalnet_tpu.parallel.tp_scan import selective_scan_tp

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "shard_batch", "replicate",
    "make_global_batch",
    "selective_scan_seq_sharded", "selective_scan_tp",
]
