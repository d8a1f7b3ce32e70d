"""Eval protocol: /32 reflect pad, PSNR (both formulas), pooled SSIM."""

from focalnet_tpu.evaluation.evaluator import evaluate, validate
from focalnet_tpu.evaluation.infer import infer, tiled_forward
from focalnet_tpu.evaluation.serve import serve
from focalnet_tpu.evaluation.metrics import (
    adaptive_avg_pool,
    eval_ssim,
    pad_to_multiple,
    psnr_mse,
    psnr_skimage,
    save_image,
    ssim,
)

__all__ = [
    "evaluate", "validate", "infer", "tiled_forward", "serve",
    "pad_to_multiple", "psnr_mse", "psnr_skimage",
    "adaptive_avg_pool", "ssim", "eval_ssim", "save_image",
]
