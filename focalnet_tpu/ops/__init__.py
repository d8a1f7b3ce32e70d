"""Selective-scan ops: oracle, chunked spec, Pallas TPU kernel, cross scan/merge."""

from focalnet_tpu.ops.scan_ref import selective_scan_ref, selective_scan_assoc
from focalnet_tpu.ops.scan_chunked import selective_scan_chunked
from focalnet_tpu.ops.scan_matrix import selective_scan_matrix
from focalnet_tpu.ops.selective_scan import selective_scan
from focalnet_tpu.ops.cross_scan import cross_scan, cross_merge, cross_scan_1b1, cross_merge_1b1

__all__ = [
    "selective_scan_ref",
    "selective_scan_assoc",
    "selective_scan_chunked",
    "selective_scan_matrix",
    "selective_scan",
    "cross_scan",
    "cross_merge",
    "cross_scan_1b1",
    "cross_merge_1b1",
]
