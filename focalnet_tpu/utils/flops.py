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


def mimounet_scan_flops(cfg, hw=(256, 256), batch: int = 1) -> int:
    """Total selective-scan FLOPs for one MIMOUNet forward at ``hw``.

    Per VSSG branch: depth blocks x scan over L=(H_s/ps)^2 with
    D = K_dirs * d_inner channels; 6 stages (3 encoder + 3 decoder), each
    ``num_res`` VSSGs; the gl_merge variant adds the local branch.
    """
    H, W = hw
    d_inner = int(cfg.ssm_ratio * cfg.vssg_dim)
    D = 4 * d_inner  # K=4 directions folded into channels
    N = cfg.ssm_d_state
    depth = sum(cfg.depths)
    total = 0
    for scale in (1, 2, 4):  # full/half/quarter stages, encoder + decoder
        hs, ws = H // scale, W // scale
        branches = [cfg.patch_size_global]
        if cfg.gl_merge:
            branches.append(cfg.patch_size_local)
        for ps in branches:
            L = (hs // ps) * (ws // ps)
            total += 2 * cfg.num_res * depth * scan_flops(batch, L, D, N)
    return total


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
