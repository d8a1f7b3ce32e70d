"""Configuration system: model presets + training hyperparameters.

The reference hardcodes architecture at construction sites and snapshots code
per variant (SURVEY.md §5.6); here every knob is an explicit dataclass field
and the 4 trained configurations are named presets (SURVEY.md §0 table):

    baseline  — conv ResBlock x 1 per stage (``results_baseline/code/MIMOUNet.py:47``)
    1mlp      — VSSG, gl_merge=True, ps_global=4, ps_local=2, mlp_ratio=1.0
    1mlp_g2   — VSSG, gl_merge=False, ps_global=2  (the live tree; flagship)
    1mlp_g4   — VSSG, gl_merge=False, ps_global=4

Training defaults mirror ``ITS/main.py:62-87`` / ``ITS/train.py:17-23``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """MIMOUNet + stage-module architecture."""

    # assembly (``MIMOUNet.py:80-83``)
    dims: Tuple[int, int, int] = (32, 64, 128)
    num_res: int = 1
    block_type: str = "vssg"  # "vssg" | "resblock"

    # VSSG (``vmamba_layers.py:806-957``; construction site ``MIMOUNet.py:16,40``)
    gl_merge: bool = False
    patch_size_global: int = 2
    patch_size_local: int = 2
    depths: Tuple[int, ...] = (2,)
    vssg_dim: int = 96
    drop_path_rate: float = 0.1

    # SS2D (``vmamba_layers.py:817-834``)
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v4"
    # dtype for the SS2D projection-einsum INPUTS (fp32 accumulation either
    # way; "" keeps the operand dtype).  Measured a PERF AND NUMERICS NO-OP
    # on TPU: jax's DEFAULT matmul precision already runs fp32 dots as
    # single-pass bf16 on the MXU (verified bit-identical on v5e, r3), so
    # explicit bf16 operands change nothing.  Kept for environments that
    # raise jax_default_matmul_precision (e.g. "highest"), where it buys the
    # MXU speedup back at the documented bf16 rounding cost.
    ssm_proj_dtype: str = ""
    # dtype of the selective-scan OUTPUT y.  "" keeps the reference "oflex"
    # contract (fp32 out even from bf16 inputs, cusoflex/selective_scan_
    # oflex.cpp:164,234-240).  "bfloat16" (sensible only with
    # compute_dtype=bfloat16) emits y — and therefore the y_accum chain, the
    # raster de-permutes, and the backward's dy — at half width; the scan
    # STATE and all in-kernel accumulation stay fp32 regardless.
    ssm_out_dtype: str = ""

    # MLP branch
    mlp_ratio: float = 1.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0

    # TPU execution
    use_checkpoint: bool = False
    scan_backend: str = "auto"  # auto | pallas | chunked | assoc | ref
    compute_dtype: str = "float32"  # params fp32; bf16 activations opt-in
    # multi-chip: mesh axis names for sequence-parallel SS2D scans (the scan
    # L = H*W is sharded over `seq_axis`; `data_axis` names the batch axis so
    # the prefix exchange stays within each data shard's subgroup).  The Mesh
    # itself is passed to build_net(seq_mesh=...) — not serializable config.
    seq_axis: Any = None    # Optional[str]
    data_axis: Any = None   # Optional[str]
    # tensor parallelism: shard the K*d_inner scan channels of every SS2D
    # over this mesh axis (whole-group or sub-group, parallel/tp_scan.py).
    # Mutually exclusive with seq_axis (both shard the same scan call);
    # composes with data_axis on a dp x tp mesh.
    tp_axis: Any = None     # Optional[str]

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training/eval hyperparameters (``ITS/main.py:62-87``, ``ITS/train.py:17-23``)."""

    data_dir: str = "dataset/ITS"
    batch_size: int = 4
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    num_epoch: int = 300
    warmup_epochs: int = 3
    lr_min: float = 1e-6
    grad_clip: float = 0.001  # clip_grad_norm_(0.001), ``train.py:90``
    fft_loss_weight: float = 0.1  # loss = content + 0.1 * fft, ``train.py:88``
    # micro-batches per optimizer step (activation HBM scales with
    # batch_size/grad_accum while the effective batch stays batch_size)
    grad_accum: int = 1
    print_freq: int = 100
    num_worker: int = 8
    save_freq: int = 10
    valid_freq: int = 10
    valid_batch: int = 1  # >1 = batched validation (same metrics, faster)
    crop_size: int = 256
    seed: int = 1234  # ``main.py:11-14``
    model_save_dir: str = "results/weights"
    # TPU-specific.  mesh_shape=None -> auto: DP over the largest device
    # count that divides batch_size (all devices when batch_size % n == 0),
    # so multi-device hosts data-parallelize out of the box.
    mesh_shape: Any = None  # Optional[Tuple[int, ...]]
    mesh_axes: Tuple[str, ...] = ("data",)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


PRESETS = {
    # num_res=1: the snapshot's MIMOUNet defaults num_res=1
    # (``results_baseline/code/MIMOUNet.py:47``) and its main.py passes only
    # the model name — EBlock/DBlock's num_res=8 DEFAULTS are never used
    # (verified by cross-framework parity against the snapshot module tree)
    "baseline": ModelConfig(block_type="resblock", num_res=1),
    "1mlp": ModelConfig(
        gl_merge=True, patch_size_global=4, patch_size_local=2, mlp_ratio=1.0
    ),
    "1mlp_g2": ModelConfig(
        gl_merge=False, patch_size_global=2, patch_size_local=2, mlp_ratio=1.0
    ),
    "1mlp_g4": ModelConfig(
        gl_merge=False, patch_size_global=4, patch_size_local=2, mlp_ratio=1.0
    ),
}
