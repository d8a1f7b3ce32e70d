"""Conv building blocks (NHWC, TPU-native layouts).

TPU equivalents of the reference's conv layers
(``/root/reference/ITS/models/layers.py``): ``BasicConv`` (conv / transposed
conv + optional BatchNorm + GELU), ``ResBlock`` (the baseline variant's
residual unit), and ``GhostModule`` (primary 1x1 + cheap depthwise, unused in
the live forward but part of the component inventory).  All modules take and
return ``(B, H, W, C)`` — the layout XLA's TPU conv emitter is native in —
instead of the reference's NCHW.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from focalnet_tpu.models.initializers import torch_bias_init, torch_default


def gelu_exact(x):
    """PyTorch nn.GELU default = exact erf formulation."""
    return nn.gelu(x, approximate=False)


class BasicConv(nn.Module):
    """Conv2d/ConvTranspose2d + optional BatchNorm + GELU.

    Mirrors ``BasicConv`` (``layers.py:4-25``): padding k//2 (SAME for odd k),
    bias dropped when norm is on, "relu=True" actually meaning GELU.  The
    transpose path (k=4, s=2, p=1 in the reference) is expressed as a SAME
    ConvTranspose which produces the identical 2x upsampling geometry.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    bias: bool = True
    norm: bool = False
    act: bool = True
    transpose: bool = False
    dtype: Any = None  # computation dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.bias and not self.norm
        k = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * k * k
        common = dict(
            features=self.out_channels,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            use_bias=use_bias,
            kernel_init=torch_default,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )
        if self.transpose:
            x = nn.ConvTranspose(padding="SAME", **common)(x)
        else:
            # torch pads k//2 on both sides: SAME for odd k
            pad = k // 2
            x = nn.Conv(padding=[(pad, pad), (pad, pad)], **common)(x)
        if self.norm:
            # Latent foot-gun, deliberately guarded: no call site in any of
            # the four presets uses norm=True (the reference builds every
            # BasicConv with norm=False), and nothing threads the mutable
            # ``batch_stats`` collection BatchNorm needs during training.
            # Fail loudly at init rather than deep inside a train step.
            assert not train or self.is_mutable_collection("batch_stats"), (
                "BasicConv(norm=True) under training requires the caller to "
                "thread a mutable 'batch_stats' collection through "
                "model.apply; no preset does — wire it up before enabling."
            )
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if self.act:
            x = gelu_exact(x)
        return x


class ResBlock(nn.Module):
    """conv-GELU-conv + residual — the baseline variant's stage block
    (``layers.py:28-40``, live in ``results_baseline/code/MIMOUNet.py:8-23``)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = BasicConv(self.channels, 3, act=True, dtype=self.dtype)(x, train=train)
        h = BasicConv(self.channels, 3, act=False, dtype=self.dtype)(h, train=train)
        return h + x


class GhostModule(nn.Module):
    """Ghost conv: primary conv + cheap depthwise, concat, slice to oup
    (``layers.py:68-90``).  Inventory parity; unused by the live forward."""

    out_channels: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        init_ch = math.ceil(self.out_channels / self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        k, dw = self.kernel_size, self.dw_size
        x1 = nn.Conv(
            init_ch, (k, k), strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2, use_bias=False,
            kernel_init=torch_default,
        )(x)
        x2 = nn.Conv(
            new_ch, (dw, dw), padding=[(dw // 2, dw // 2)] * 2,
            feature_group_count=init_ch, use_bias=False,
            kernel_init=torch_default,
        )(x1)
        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., : self.out_channels]


class SCM(nn.Module):
    """Shallow conv module: 3 -> C feature stem for the downscaled inputs,
    ending in affine InstanceNorm (``MIMOUNet.py:58-70``)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.out_channels
        dt = self.dtype
        x = BasicConv(c // 4, 3, act=True, dtype=dt)(x, train=train)
        x = BasicConv(c // 2, 1, act=True, dtype=dt)(x, train=train)
        x = BasicConv(c // 2, 3, act=True, dtype=dt)(x, train=train)
        x = BasicConv(c, 1, act=False, dtype=dt)(x, train=train)
        # InstanceNorm2d(affine=True) == per-sample, per-channel norm over HW
        # (norm math in fp32 for stability, result cast back).
        # use_fast_variance=False: flax's default E[x^2]-E[x]^2 form loses
        # ~1e-3 on channels where |mean| >> std (post-conv stems here), while
        # torch computes the cancellation-free two-pass variance — this was
        # the dominant term in the cross-framework parity error.
        y = nn.GroupNorm(
            num_groups=c, epsilon=1e-5, dtype=jnp.float32,
            use_fast_variance=False,
        )(x)
        return y.astype(x.dtype)


class FAM(nn.Module):
    """Feature attention/fusion module: concat + 3x3 merge conv
    (``MIMOUNet.py:72-77``)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = False):
        return BasicConv(self.channels, 3, act=False, dtype=self.dtype)(
            jnp.concatenate([x1, x2], axis=-1), train=train
        )


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle: (B, H, W, C*r*r) -> (B, H*r, W*r, C).

    Channel-index convention matches PyTorch's PixelShuffle
    (out[h*r+i, w*r+j, c] = in[h, w, c*r*r + i*r + j]) so converted weights
    stay compatible.
    """
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(B, H * r, W * r, C)


def nearest_down2(x):
    """PyTorch F.interpolate(scale_factor=0.5) default (nearest): out[i]=in[2i]."""
    return x[:, ::2, ::2, :]
