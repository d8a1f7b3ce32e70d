"""MambaSS2D — bidirectional 1-D Mamba block over the flattened H*W sequence.

Behavioral spec: ``/root/reference/ITS/models/vmamba_layers.py:603-713``
(``MambaSS2D``): in_proj -> x/z chunk -> depthwise conv -> SiLU -> a 1-D Mamba
(S6) pass over the flattened sequence AND over the flipped sequence -> gate by
z -> sum of both directions -> out_proj.  In the reference this imports the
external ``mamba_ssm`` CUDA package (X1 in SURVEY.md §2.2) plus
``causal-conv1d`` (X2); unused by the live forward but load-bearing for module
import and part of the component inventory.

TPU-native rebuild: the inner Mamba block is expressed on the SAME Pallas
selective scan as SS2D (K=1 direction), and the causal depthwise conv1d is
``lax.conv_general_dilated`` with left padding — no external native deps.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from focalnet_tpu.models.initializers import (
    a_log_init,
    dt_bias_init,
    torch_bias_init,
    torch_default,
    trunc_normal_02,
    uniform_pm,
)
from focalnet_tpu.ops.selective_scan import selective_scan


def causal_conv1d(x, w, b=None):
    """Fused causal depthwise conv1d (the causal-conv1d equivalent).

    x: (B, L, D); w: (K, D) depthwise taps; left-pads so position t sees only
    t-K+1..t.  Returns (B, L, D).
    """
    K, D = w.shape
    x_pad = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x_pad, w[:, None, :],  # (K, 1, D) HIO for feature groups
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=D,
    )
    if b is not None:
        out = out + b
    return out


class Mamba1D(nn.Module):
    """A single-direction Mamba (S6) block on (B, L, d_model) sequences —
    the ``mamba_ssm.Mamba`` equivalent, running on the Pallas scan."""

    d_model: int
    d_state: int = 16
    expand: int = 2
    d_conv: int = 4
    dt_rank: Any = "auto"
    conv_bias: bool = True
    bias: bool = False
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        d_inner = self.expand * self.d_model
        R = (
            math.ceil(self.d_model / 16)
            if self.dt_rank == "auto"
            else self.dt_rank
        )
        N = self.d_state

        h = nn.Dense(2 * d_inner, use_bias=self.bias,
                     kernel_init=trunc_normal_02, name="in_proj")(x)
        h, z = jnp.split(h, 2, axis=-1)

        conv_w = self.param("conv1d_weight", torch_default, (self.d_conv, d_inner))
        conv_b = (
            self.param("conv1d_bias", torch_bias_init(self.d_conv), (d_inner,))
            if self.conv_bias else None
        )
        h = nn.silu(causal_conv1d(h, conv_w, conv_b))

        x_proj = self.param("x_proj_weight",
                            uniform_pm(1.0 / math.sqrt(d_inner)),
                            (R + 2 * N, d_inner))
        dt_w = self.param("dt_proj_weight", uniform_pm(R ** -0.5), (d_inner, R))
        dt_b = self.param("dt_proj_bias", dt_bias_init(), (d_inner,))
        A_logs = self.param("A_logs", a_log_init(N, 1), (d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (d_inner,))

        dbl = jnp.einsum("bld,cd->blc", h, x_proj,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        dts, Bs, Cs = jnp.split(dbl, [R, R + N], axis=-1)
        dts = jnp.einsum("blr,dr->bld", dts, dt_w,
                         preferred_element_type=jnp.float32).astype(h.dtype)

        u = jnp.swapaxes(h, 1, 2)                    # (B, D, L)
        delta = jnp.swapaxes(dts, 1, 2)
        Bm = jnp.swapaxes(Bs, 1, 2)[:, None]         # (B, 1, N, L)
        Cm = jnp.swapaxes(Cs, 1, 2)[:, None]
        A = -jnp.exp(A_logs.astype(jnp.float32))

        y = selective_scan(
            u, delta, A, Bm, Cm, D=Ds, delta_bias=dt_b,
            delta_softplus=True, out_dtype=jnp.float32,
            backend=self.scan_backend,
        )
        y = jnp.swapaxes(y, 1, 2).astype(x.dtype)    # (B, L, D)
        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=self.bias,
                        kernel_init=trunc_normal_02, name="out_proj")(y)


class MambaSS2D(nn.Module):
    """Bidirectional 1-D Mamba over flattened H*W (``vmamba_layers.py:689-713``):
    forward pass + flipped pass, each gated, summed."""

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    d_conv: int = 3
    conv_bias: bool = True
    act: str = "silu"
    bias: bool = False
    dropout: float = 0.0
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, H, W, d_model) -> (B, H, W, d_model)."""
        B, H, W, _ = x.shape
        d_inner = int(self.ssm_ratio * self.d_model)
        act = nn.silu

        h = nn.Dense(2 * d_inner, use_bias=self.bias,
                     kernel_init=trunc_normal_02, name="in_proj")(x)
        h, z = jnp.split(h, 2, axis=-1)
        z = act(z)
        pad = (self.d_conv - 1) // 2
        h = nn.Conv(d_inner, (self.d_conv, self.d_conv),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=d_inner, use_bias=self.conv_bias,
                    kernel_init=torch_default, name="conv2d")(h)
        h = act(h)

        seq = h.reshape(B, H * W, d_inner)
        fwd = Mamba1D(d_model=d_inner, d_state=self.d_state,
                      scan_backend=self.scan_backend, name="mamba_fwd")(seq)
        bwd = Mamba1D(d_model=d_inner, d_state=self.d_state,
                      scan_backend=self.scan_backend, name="mamba_bwd")(
            jnp.flip(seq, axis=1))
        y = (fwd + jnp.flip(bwd, axis=1)).reshape(B, H, W, d_inner)

        y = y * z
        out = nn.Dense(self.d_model, use_bias=self.bias,
                       kernel_init=trunc_normal_02, name="out_proj")(y)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
