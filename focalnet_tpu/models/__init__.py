"""Flax model modules (NHWC, TPU-native layouts)."""

from focalnet_tpu.models.layers import (
    FAM,
    SCM,
    BasicConv,
    GhostModule,
    ResBlock,
    nearest_down2,
    pixel_shuffle,
)
from focalnet_tpu.models.mamba1d import Mamba1D, MambaSS2D, causal_conv1d
from focalnet_tpu.models.mimounet import MIMOUNet, StageStack, build_net
from focalnet_tpu.models.ss2d import SS2D, DropPath, Mlp, parse_forward_type
from focalnet_tpu.models.vssg import VSSG, VSSBlock

__all__ = [
    "BasicConv", "ResBlock", "GhostModule", "SCM", "FAM",
    "pixel_shuffle", "nearest_down2",
    "SS2D", "Mlp", "DropPath", "parse_forward_type",
    "VSSBlock", "VSSG",
    "Mamba1D", "MambaSS2D", "causal_conv1d",
    "MIMOUNet", "StageStack", "build_net",
]
