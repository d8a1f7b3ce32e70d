"""MIMO-UNet assembly — the 3-scale encoder/decoder dehazing network.

Behavioral spec: ``/root/reference/ITS/models/MIMOUNet.py``.  EBlock/DBlock =
``num_res`` stage modules (VSSG with an outer residual for the SSM variants;
ResBlock x1 with NO outer residual for the trained baseline snapshot,
``results_baseline/code/MIMOUNet.py:8-23,47``); multi-input (x, x/2, x/4 via nearest
downsampling, ``:124-125``) and multi-output (3 scales, each added to its
input, ``:129-162``).

NHWC throughout.  Returns ``[out_quarter, out_half, out_full]`` exactly like
the reference (index [2] is the full-resolution restoration used by eval,
``ITS/valid.py:32``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from focalnet_tpu.configs import ModelConfig, PRESETS
from focalnet_tpu.models.layers import FAM, SCM, BasicConv, ResBlock, nearest_down2
from focalnet_tpu.models.vssg import VSSG


def _cfg_dtype(cfg: ModelConfig):
    """compute_dtype config -> jnp dtype (None = fp32 end to end)."""
    if cfg.compute_dtype in (None, "float32", "fp32"):
        return None
    return jnp.dtype(cfg.compute_dtype)


class StageStack(nn.Module):
    """EBlock/DBlock shared body: num_res stage modules + outer residual
    (``MIMOUNet.py:10-55``)."""

    channels: int
    cfg: ModelConfig
    seq_mesh: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, train: bool = False):
        res = x
        c = self.cfg
        for i in range(c.num_res):
            if c.block_type == "vssg":
                res = VSSG(
                    in_chans=self.channels,
                    patch_size_global=c.patch_size_global,
                    patch_size_local=c.patch_size_local,
                    gl_merge=c.gl_merge,
                    depths=c.depths,
                    dim=c.vssg_dim,
                    ssm_d_state=c.ssm_d_state,
                    ssm_ratio=c.ssm_ratio,
                    ssm_dt_rank=c.ssm_dt_rank,
                    ssm_act=c.ssm_act,
                    ssm_conv=c.ssm_conv,
                    ssm_conv_bias=c.ssm_conv_bias,
                    ssm_drop_rate=c.ssm_drop_rate,
                    ssm_init=c.ssm_init,
                    forward_type=c.forward_type,
                    mlp_ratio=c.mlp_ratio,
                    mlp_act=c.mlp_act,
                    mlp_drop_rate=c.mlp_drop_rate,
                    drop_path_rate=c.drop_path_rate,
                    use_checkpoint=c.use_checkpoint,
                    scan_backend=c.scan_backend,
                    dtype=_cfg_dtype(c),
                    proj_dtype=(None if c.ssm_proj_dtype in (None, "", "float32", "fp32")
                                else c.ssm_proj_dtype),
                    ssm_out_dtype=(None if c.ssm_out_dtype in (None, "", "float32", "fp32")
                                   else c.ssm_out_dtype),
                    seq_mesh=self.seq_mesh,
                    seq_axis=c.seq_axis,
                    data_axis=c.data_axis,
                    tp_axis=c.tp_axis,
                    name=f"layers_{i}",
                )(res, deterministic=deterministic)
            else:  # baseline conv ResBlocks
                res = ResBlock(self.channels, dtype=_cfg_dtype(c),
                               name=f"layers_{i}")(res, train=train)
        if c.block_type == "vssg":
            # outer residual exists only in the VSSG tree
            # (``MIMOUNet.py:22-24``); the baseline snapshot's EBlock/DBlock
            # return self.layers(x) with residuals INSIDE each ResBlock
            # (``results_baseline/code/MIMOUNet.py:8-23``)
            res = res + x
        return res


class MIMOUNet(nn.Module):
    """3-scale MIMO-UNet (``MIMOUNet.py:79-162``), dims [32, 64, 128]."""

    cfg: ModelConfig
    # the Mesh for the cfg.seq_axis sequence-parallel scans (not part of
    # ModelConfig: a Mesh is not JSON-serializable config)
    seq_mesh: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, train: bool = False):
        """x: (B, H, W, 3) hazy image in [0, 1].  H, W multiples of 32.

        Returns [out_4, out_2, out_1] at 1/4, 1/2, full resolution.
        """
        d0, d1, d2 = self.cfg.dims
        dt = _cfg_dtype(self.cfg)
        kw = dict(deterministic=deterministic, train=train)
        ckw = dict(train=train)

        in_dtype = x.dtype
        if dt is not None:
            x = x.astype(dt)
        x_2 = nearest_down2(x)
        x_4 = nearest_down2(x_2)
        z2 = SCM(d1, dtype=dt, name="SCM2")(x_2, **ckw)
        z4 = SCM(d2, dtype=dt, name="SCM1")(x_4, **ckw)

        outputs = []
        # full res
        x_ = BasicConv(d0, 3, act=True, dtype=dt, name="feat_extract_0")(x, **ckw)
        res1 = StageStack(d0, self.cfg, seq_mesh=self.seq_mesh, name="Encoder_0")(x_, **kw)
        # half res
        z = BasicConv(d1, 3, stride=2, act=True, dtype=dt,
                      name="feat_extract_1")(res1, **ckw)
        z = FAM(d1, dtype=dt, name="FAM2")(z, z2, **ckw)
        res2 = StageStack(d1, self.cfg, seq_mesh=self.seq_mesh, name="Encoder_1")(z, **kw)
        # quarter res
        z = BasicConv(d2, 3, stride=2, act=True, dtype=dt,
                      name="feat_extract_2")(res2, **ckw)
        z = FAM(d2, dtype=dt, name="FAM1")(z, z4, **ckw)
        z = StageStack(d2, self.cfg, seq_mesh=self.seq_mesh, name="Encoder_2")(z, **kw)

        z = StageStack(d2, self.cfg, seq_mesh=self.seq_mesh, name="Decoder_0")(z, **kw)
        z_ = BasicConv(3, 3, act=False, dtype=dt, name="ConvsOut_0")(z, **ckw)
        z = BasicConv(d1, 4, stride=2, act=True, transpose=True, dtype=dt,
                      name="feat_extract_3")(z, **ckw)
        outputs.append(z_ + x_4)

        z = jnp.concatenate([z, res2], axis=-1)
        z = BasicConv(d1, 1, act=True, dtype=dt, name="Convs_0")(z, **ckw)
        z = StageStack(d1, self.cfg, seq_mesh=self.seq_mesh, name="Decoder_1")(z, **kw)
        z_ = BasicConv(3, 3, act=False, dtype=dt, name="ConvsOut_1")(z, **ckw)
        z = BasicConv(d0, 4, stride=2, act=True, transpose=True, dtype=dt,
                      name="feat_extract_4")(z, **ckw)
        outputs.append(z_ + x_2)

        z = jnp.concatenate([z, res1], axis=-1)
        z = BasicConv(d0, 1, act=True, dtype=dt, name="Convs_1")(z, **ckw)
        z = StageStack(d0, self.cfg, seq_mesh=self.seq_mesh, name="Decoder_2")(z, **kw)
        z = BasicConv(3, 3, act=False, dtype=dt, name="feat_extract_5")(z, **ckw)
        outputs.append(z + x)

        if dt is not None:  # restore fp32 outputs for loss/metrics
            outputs = [o.astype(in_dtype) for o in outputs]
        return outputs


def build_net(preset: str = "1mlp_g2", seq_mesh=None, **overrides) -> MIMOUNet:
    """Factory mirroring ``build_net()`` (``MIMOUNet.py:181-182``), extended
    with the 4 trained configurations as named presets (SURVEY.md §0).

    ``seq_mesh``: the jax Mesh carrying ``cfg.seq_axis`` / ``cfg.data_axis``
    for sequence-parallel SS2D scans (pass seq_axis/data_axis as overrides).
    """
    cfg = PRESETS[preset]
    if overrides:
        cfg = cfg.replace(**overrides)
    return MIMOUNet(cfg=cfg, seq_mesh=seq_mesh)
