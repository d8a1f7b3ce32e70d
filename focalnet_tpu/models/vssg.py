"""VSSBlock / GlobalScan / GlobalLocalScan / VSSG — the state-space stage
modules (behavioral spec: ``/root/reference/ITS/models/vmamba_layers.py:715-1177``).

A VSSG is: patch-embed (conv k=ps, s=ps + LayerNorm) -> N x VSSBlock (pre-norm
SS2D residual + pre-norm MLP residual, DropPath) -> patch-unembed (1x1 conv to
C*ps^2 + PixelShuffle).  ``gl_merge`` selects a dual global+local branch pair
whose un-embeds are summed (``forward_gl``, ``:959-978``) vs a single global
branch (``forward_g``, ``:980-987``).

TPU notes: NHWC throughout; ``remat`` (jax.checkpoint) replaces
``use_checkpoint``'s torch activation checkpointing; drop-path rates follow
the linspace(0, drop_path_rate, sum(depths)) stochastic-depth rule (``:853``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from focalnet_tpu.models.initializers import torch_bias_init, torch_default
from focalnet_tpu.models.layers import pixel_shuffle
from focalnet_tpu.models.ss2d import SS2D, DropPath, Mlp


class VSSBlock(nn.Module):
    """Pre-norm SS2D residual + optional pre-norm MLP residual
    (``vmamba_layers.py:715-803``)."""

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v4"
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    post_norm: bool = False
    use_checkpoint: bool = False
    scan_backend: str = "auto"
    dtype: Any = None
    proj_dtype: Any = None
    ssm_out_dtype: Any = None
    seq_mesh: Any = None
    seq_axis: Any = None
    data_axis: Any = None
    tp_axis: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        ssm_branch = self.ssm_ratio > 0
        mlp_branch = self.mlp_ratio > 0

        def body(mdl, x):
            if ssm_branch:
                op = SS2D(
                    d_model=mdl.hidden_dim,
                    d_state=mdl.ssm_d_state,
                    ssm_ratio=mdl.ssm_ratio,
                    dt_rank=mdl.ssm_dt_rank,
                    act=mdl.ssm_act,
                    d_conv=mdl.ssm_conv,
                    conv_bias=mdl.ssm_conv_bias,
                    dropout=mdl.ssm_drop_rate,
                    initialize=mdl.ssm_init,
                    forward_type=mdl.forward_type,
                    scan_backend=mdl.scan_backend,
                    dtype=mdl.dtype,
                    proj_dtype=mdl.proj_dtype,
                    ssm_out_dtype=mdl.ssm_out_dtype,
                    seq_mesh=mdl.seq_mesh,
                    seq_axis=mdl.seq_axis,
                    data_axis=mdl.data_axis,
                    tp_axis=mdl.tp_axis,
                    name="op",
                )
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
                h = op(h.astype(x.dtype), deterministic=deterministic)
                x = x + DropPath(mdl.drop_path)(h, deterministic=deterministic)
            if mlp_branch:
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
                h = Mlp(
                    hidden_features=int(mdl.hidden_dim * mdl.mlp_ratio),
                    act=mdl.mlp_act,
                    drop=mdl.mlp_drop_rate,
                    dtype=mdl.dtype,
                    name="mlp",
                )(h.astype(x.dtype), deterministic=deterministic)
                x = x + DropPath(mdl.drop_path)(h, deterministic=deterministic)
            return x

        if self.use_checkpoint:
            # prevent_cse must stay True or XLA CSEs the recomputation away
            # and the checkpoint saves nothing
            return nn.remat(body)(self, x)
        return body(self, x)


def _make_blocks(prefix, depth, dim, dpr, cfg, scan_backend):
    return [
        VSSBlock(
            hidden_dim=dim,
            drop_path=dpr[d],
            ssm_d_state=cfg["ssm_d_state"],
            ssm_ratio=cfg["ssm_ratio"],
            ssm_dt_rank=cfg["ssm_dt_rank"],
            ssm_act=cfg["ssm_act"],
            ssm_conv=cfg["ssm_conv"],
            ssm_conv_bias=cfg["ssm_conv_bias"],
            ssm_drop_rate=cfg["ssm_drop_rate"],
            ssm_init=cfg["ssm_init"],
            forward_type=cfg["forward_type"],
            mlp_ratio=cfg["mlp_ratio"],
            mlp_act=cfg["mlp_act"],
            mlp_drop_rate=cfg["mlp_drop_rate"],
            use_checkpoint=cfg["use_checkpoint"],
            scan_backend=scan_backend,
            dtype=cfg.get("dtype"),
            proj_dtype=cfg.get("proj_dtype"),
            ssm_out_dtype=cfg.get("ssm_out_dtype"),
            seq_mesh=cfg.get("seq_mesh"),
            seq_axis=cfg.get("seq_axis"),
            data_axis=cfg.get("data_axis"),
            tp_axis=cfg.get("tp_axis"),
            name=f"{prefix}{d}",
        )
        for d in range(depth)
    ]


class VSSG(nn.Module):
    """Visual State Space Group: the residual-stage replacement module
    (``vmamba_layers.py:806-1023``).  Internal dim fixed at 96 (``:839``),
    depths=[2] by default.

    ``gl_merge=True``: dual global (patch_size_global) + local
    (patch_size_local) branches, un-embedded and summed.  ``False``: single
    global branch — the live "g2" configuration
    (``/root/reference/ITS/models/MIMOUNet.py:16,40``).
    """

    in_chans: int
    patch_size_global: int = 2
    patch_size_local: int = 2
    gl_merge: bool = False
    depths: Sequence[int] = (2,)
    dim: int = 96
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    ssm_init: str = "v0"
    forward_type: str = "v4"
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    scan_backend: str = "auto"
    dtype: Any = None
    proj_dtype: Any = None
    ssm_out_dtype: Any = None
    seq_mesh: Any = None
    seq_axis: Any = None
    data_axis: Any = None
    tp_axis: Any = None

    def _patch_embed(self, x, ps, name):
        """conv(k=ps, s=ps) + LayerNorm (``vmamba_layers.py:940-947``)."""
        fan_in = x.shape[-1] * ps * ps
        x = nn.Conv(
            self.dim, (ps, ps), strides=(ps, ps), padding="VALID",
            kernel_init=torch_default, bias_init=torch_bias_init(fan_in),
            dtype=self.dtype, name=f"{name}_conv",
        )(x)
        if self.patch_norm:
            dt = x.dtype
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_norm")(x).astype(dt)
        return x

    def _patch_unembed(self, x, ps, out_chans, name):
        """1x1 conv to C*ps^2 + PixelShuffle(ps) (``vmamba_layers.py:949-957``)."""
        x = nn.Conv(
            out_chans * ps * ps, (1, 1), padding="VALID",
            kernel_init=torch_default, bias_init=torch_bias_init(self.dim),
            dtype=self.dtype, name=f"{name}_conv",
        )(x)
        return pixel_shuffle(x, ps)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = dict(
            ssm_d_state=self.ssm_d_state, ssm_ratio=self.ssm_ratio,
            ssm_dt_rank=self.ssm_dt_rank, ssm_act=self.ssm_act,
            ssm_conv=self.ssm_conv, ssm_conv_bias=self.ssm_conv_bias,
            ssm_drop_rate=self.ssm_drop_rate, ssm_init=self.ssm_init,
            forward_type=self.forward_type, mlp_ratio=self.mlp_ratio,
            mlp_act=self.mlp_act, mlp_drop_rate=self.mlp_drop_rate,
            use_checkpoint=self.use_checkpoint, dtype=self.dtype,
            proj_dtype=self.proj_dtype, ssm_out_dtype=self.ssm_out_dtype,
            seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
            data_axis=self.data_axis, tp_axis=self.tp_axis,
        )
        total_depth = sum(self.depths)
        dpr = list(np.linspace(0.0, self.drop_path_rate, total_depth))

        out_chans = self.in_chans
        if self.gl_merge:
            xg = self._patch_embed(x, self.patch_size_global, "patch_embed_global")
            xl = self._patch_embed(x, self.patch_size_local, "patch_embed_local")
            offset = 0
            for i, depth in enumerate(self.depths):
                for blk in _make_blocks(
                    f"layers_{i}_global_", depth, self.dim,
                    dpr[offset : offset + depth], cfg, self.scan_backend,
                ):
                    xg = blk(xg, deterministic=deterministic)
                for blk in _make_blocks(
                    f"layers_{i}_local_", depth, self.dim,
                    dpr[offset : offset + depth], cfg, self.scan_backend,
                ):
                    xl = blk(xl, deterministic=deterministic)
                offset += depth
            xg = self._patch_unembed(
                xg, self.patch_size_global, out_chans, "patch_unembed_global"
            )
            xl = self._patch_unembed(
                xl, self.patch_size_local, out_chans, "patch_unembed_local"
            )
            return xg + xl
        else:
            xg = self._patch_embed(x, self.patch_size_global, "patch_embed_global")
            offset = 0
            for i, depth in enumerate(self.depths):
                for blk in _make_blocks(
                    f"layers_{i}_global_", depth, self.dim,
                    dpr[offset : offset + depth], cfg, self.scan_backend,
                ):
                    xg = blk(xg, deterministic=deterministic)
                offset += depth
            return self._patch_unembed(
                xg, self.patch_size_global, out_chans, "patch_unembed_global"
            )
