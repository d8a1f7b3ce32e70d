"""FLOPs accounting.

Reproduces the reference's complexity report (``/root/reference/ITS/main.py:37-50``):
the selective-scan cost model 9·B·L·D·N (+2·B·L·D for the D skip)
(``ITS/models/vmamba_layers.py:96-117``) plus XLA's own HLO cost analysis for
everything else — the TPU-native replacement for ptflops/fvcore.
"""

from __future__ import annotations

import jax


def scan_flops(B: int, L: int, D: int, N: int, with_D: bool = True,
               with_Z: bool = False) -> int:
    """The reference's ``flops_selective_scan_fn`` cost model
    (``vmamba_layers.py:96-117``): 9·B·L·D·N core + optional skips."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L
    return flops


def model_flops(fn, *args) -> float:
    """Estimate FLOPs of a jitted callable via XLA's cost analysis.

    Returns total FLOPs for one invocation (XLA counts fused HLO flops; the
    Pallas scan region is opaque to it, so add :func:`scan_flops` per scan
    call site for a complete figure).
    """
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns [dict]
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0))
