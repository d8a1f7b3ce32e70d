"""focalnet_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of c95yang/FocalNet.

A 3-scale MIMO-UNet image-dehazing framework whose residual stages are
VMamba-style 2-D selective-scan (SS2D) state-space blocks, built TPU-first:

- ``ops``        selective-scan kernels: pure-JAX oracles, chunked
                 formulation, Pallas TPU kernel with custom VJP, 4-direction
                 cross scan/merge
- ``models``     Flax modules: BasicConv/SCM/FAM, SS2D, VSSBlock, VSSG,
                 MambaSS2D, MIMOUNet (presets: baseline/1mlp/1mlp_g2/1mlp_g4)
- ``data``       RESIDE-ITS pair pipeline (paired crop/flip, prefetch,
                 native C++ decode backend)
- ``train``      optax train loop: warmup+cosine LR, multiscale L1+FFT loss,
                 global-norm clip, Orbax checkpointing
- ``evaluation`` /32 reflect-pad eval protocol, PSNR/SSIM metrics, GT-free
                 inference
- ``parallel``   device-mesh sharding (dp/tp/sp) and the sequence-sharded
                 blockwise scan
- ``utils``      meters, FLOPs accounting, profiling, log plots, torch
                 checkpoint conversion

Reference behavior is documented per-symbol with file:line citations into the
reference repo (see SURVEY.md and PARITY.md).  No reference code is copied;
the compute path is re-designed for TPU (MXU matmuls, VPU scans in VMEM, XLA
collectives).

Quick start::

    from focalnet_tpu import build_net
    model = build_net("1mlp_g2")
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "build_net":
        from focalnet_tpu.models import build_net

        return build_net
    if name in ("train", "evaluate", "validate", "infer"):
        if name == "train":
            from focalnet_tpu.train import train as f
        elif name == "evaluate":
            from focalnet_tpu.evaluation import evaluate as f
        elif name == "validate":
            from focalnet_tpu.evaluation import validate as f
        else:
            from focalnet_tpu.evaluation import infer as f
        return f
    if name in ("ModelConfig", "TrainConfig", "PRESETS"):
        import focalnet_tpu.configs as c

        return getattr(c, name)
    raise AttributeError(name)
