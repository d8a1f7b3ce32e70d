"""focalnet_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of c95yang/FocalNet.

A 3-scale MIMO-UNet image-dehazing framework whose residual stages are
VMamba-style 2-D selective-scan (SS2D) state-space blocks, built TPU-first:

- ``ops``      selective-scan kernels: pure-JAX oracle, chunked formulation,
               Pallas TPU kernel with custom VJP, 4-direction cross scan/merge
- ``models``   Flax modules: BasicConv/SCM/FAM, SS2D, VSSBlock, VSSG, MIMOUNet
- ``data``     RESIDE-ITS pair pipeline (paired crop/flip, prefetch)
- ``train``    optax train loop: warmup+cosine LR, multiscale L1+FFT loss,
               global-norm clip, orbax checkpointing
- ``eval``     /32 reflect-pad eval protocol, PSNR/SSIM metrics
- ``parallel`` device-mesh sharding (DP) and sequence-sharded blockwise scan

Reference behavior is documented per-symbol with file:line citations into the
reference repo (see SURVEY.md). No reference code is copied; the compute path
is re-designed for TPU (MXU matmuls, VPU scans in VMEM, XLA collectives).
"""

__version__ = "0.1.0"
