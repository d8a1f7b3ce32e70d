"""SS2D — the 2-D selective-scan (VMamba S6) operator module, TPU-first.

Behavioral spec: ``/root/reference/ITS/models/vmamba_layers.py:338-601``
(SS2D: in_proj -> x/z split -> depthwise 3x3 -> SiLU -> 4-direction cross
selective scan -> out_norm -> gate by z -> out_proj) and the orchestrator
``cross_selective_scan`` (``:200-299``).

TPU-native redesign rather than translation:

- NHWC end to end; only the scan kernel boundary transposes to the
  channels-on-sublanes / sequence-on-lanes layout the Pallas kernel wants.
- The reference materializes the 4 directional copies FIRST and then runs 4
  grouped-conv1d projections over them (``vmamba_layers.py:260-271``).  Here
  the projections commute with the direction permutations (each direction is a
  pure permutation of the flattened grid), so we run ONE large matmul per
  projection on the un-permuted sequence — better MXU utilization, fewer
  layout ops — and apply the permutations afterwards.  Directions 2/3 (the
  flipped rasters) are realized by the scan kernel's ``reverse`` mode rather
  than by flipping data (see :meth:`SS2D._core`); the reference's explicit
  4-copy layout ops live on in :mod:`focalnet_tpu.ops.cross_scan`.
- ``forward_type`` keeps the reference's tag grammar (suffixes ``no32``,
  ``noz``, ``nozact``, ``none``, ``dwconv3``, ``softmax``, ``sigmoid``; base
  tags ``v01/v1/v2/v3/v4``, ``vmamba_layers.py:409-451``).  On TPU every base
  tag maps to the same kernel; the only live semantics are force_fp32 (v1/v2
  true, v3/v4 false) and the out-norm choice.
"""

from __future__ import annotations

import math
from typing import Any, Optional

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
from focalnet_tpu.ops.pallas_scan import kernel_to_raster, raster_to_kernel
from focalnet_tpu.ops.selective_scan import scan_chunk_for, selective_scan

K_DIRS = 4

_ACTS = {
    "silu": nn.silu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
}


def parse_forward_type(forward_type: str):
    """Split a forward_type tag into (base, flags) — the reference's
    ``checkpostfix`` chain (``vmamba_layers.py:409-440``)."""
    ft = forward_type
    flags = {}

    def strip(tag):
        nonlocal ft
        if ft.endswith(tag):
            ft = ft[: -len(tag)]
            return True
        return False

    flags["disable_force32"] = strip("no32")
    flags["disable_z"] = strip("noz")
    flags["disable_z_act"] = strip("nozact")
    if strip("none"):
        flags["out_norm"] = "none"
    elif strip("dwconv3"):
        flags["out_norm"] = "dwconv3"
    elif strip("softmax"):
        flags["out_norm"] = "softmax"
    elif strip("sigmoid"):
        flags["out_norm"] = "sigmoid"
    else:
        flags["out_norm"] = "ln"
    # force_fp32 per base tag: v1 unconditionally True, v01/v2 True unless
    # no32, v3/v4 False (``vmamba_layers.py:444-450``)
    flags["force_fp32"] = ft == "v1" or (
        ft in ("v01", "v2") and not flags["disable_force32"]
    )
    flags["base"] = ft
    return flags


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics used by VSSBlock)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """2-layer MLP with GELU (``vmamba_layers.py:316-334``)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: str = "gelu"
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out = self.out_features or x.shape[-1]
        dense = lambda f, name: nn.Dense(
            f, kernel_init=trunc_normal_02, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name,
        )
        x = dense(self.hidden_features, "fc1")(x)
        x = _ACTS[self.act](x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(out, "fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SS2D(nn.Module):
    """2-D selective scan operator on NHWC feature maps.

    Defaults mirror the live model's construction
    (``vmamba_layers.py:806-834``): d_state=16, ssm_ratio=2.0,
    dt_rank="auto" (ceil(d_model/16)), d_conv=3, conv_bias=True,
    forward_type "v4".
    """

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: str = "silu"
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    initialize: str = "v0"
    forward_type: str = "v4"
    scan_backend: str = "auto"
    scan_chunk: int = 2048
    dtype: Any = None  # computation dtype; scan state stays fp32
    # dtype for the x_proj/dt_proj einsum INPUTS (fp32 accumulation via
    # preferred_element_type either way).  bfloat16 feeds the MXU at 2x rate;
    # None keeps the operand dtype (exact torch parity)
    proj_dtype: Any = None
    # dtype of the scan output y.  None keeps the "oflex" fp32-out contract
    # (``cusoflex/selective_scan_oflex.cpp:164,234-240``); bfloat16 (for the
    # bf16 skeleton) halves the y / y_accum / raster-depermute / dy HBM
    # traffic.  Scan state + in-kernel accumulation stay fp32 either way.
    ssm_out_dtype: Any = None
    # sequence parallelism: shard the scan length L = H*W over mesh axis
    # `seq_axis` of `seq_mesh` (kernel-backed segment scan + prefix exchange,
    # :mod:`focalnet_tpu.parallel.seq_scan`); `data_axis` names the mesh axis
    # the batch is sharded over (dp x sp composition), None for sp-only
    seq_mesh: Any = None    # Optional[jax.sharding.Mesh]
    seq_axis: Any = None    # Optional[str]
    data_axis: Any = None   # Optional[str]
    # tensor parallelism: shard the scan's K*d_inner channels over mesh axis
    # `tp_axis` of `seq_mesh` (zero-collective channel split,
    # :mod:`focalnet_tpu.parallel.tp_scan`).  The projections around the scan
    # stay replicated — at 2.5M params there is no memory motive, and the
    # scan is the hot ~75% that actually splits.  Mutually exclusive with
    # seq_axis (both shard the same call); composes with data_axis (dp x tp).
    tp_axis: Any = None     # Optional[str]

    @property
    def d_inner(self):
        return int(self.ssm_ratio * self.d_model)

    @property
    def rank(self):
        return (
            math.ceil(self.d_model / 16)
            if self.dt_rank == "auto"
            else self.dt_rank
        )

    def _ssm_params(self):
        """x_proj / dt_proj / A_log / D parameter stacks with reference init
        laws (v0) or the simple v1/v2 debug inits (``vmamba_layers.py:483-508``)."""
        K, D, N, R = K_DIRS, self.d_inner, self.d_state, self.rank
        if self.initialize == "v0":
            x_proj = self.param(
                "x_proj_weight", uniform_pm(1.0 / math.sqrt(D)), (K, R + 2 * N, D)
            )
            dt_w = self.param(
                "dt_projs_weight",
                uniform_pm(self.dt_scale * R ** -0.5),
                (K, D, R),
            )
            dt_b = self.param(
                "dt_projs_bias",
                dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
                (K, D),
            )
            A_logs = self.param("A_logs", a_log_init(N, K), (K * D, N))
            Ds = self.param("Ds", nn.initializers.ones, (K * D,))
        elif self.initialize == "v1":
            x_proj = self.param(
                "x_proj_weight", uniform_pm(1.0 / math.sqrt(D)), (K, R + 2 * N, D)
            )
            dt_w = self.param(
                "dt_projs_weight", nn.initializers.normal(1.0), (K, D, R)
            )
            dt_b = self.param("dt_projs_bias", nn.initializers.normal(1.0), (K, D))
            A_logs = self.param("A_logs", nn.initializers.normal(1.0), (K * D, N))
            Ds = self.param("Ds", nn.initializers.ones, (K * D,))
        else:  # v2
            x_proj = self.param(
                "x_proj_weight", uniform_pm(1.0 / math.sqrt(D)), (K, R + 2 * N, D)
            )
            dt_w = self.param(
                "dt_projs_weight", nn.initializers.uniform(0.1), (K, D, R)
            )
            dt_b = self.param("dt_projs_bias", nn.initializers.uniform(0.1), (K, D))
            A_logs = self.param("A_logs", nn.initializers.zeros, (K * D, N))
            Ds = self.param("Ds", nn.initializers.ones, (K * D,))
        return x_proj, dt_w, dt_b, A_logs, Ds

    def _out_norm(self, y, flags):
        """Apply the tag-selected output normalization to (B, H, W, d_inner)."""
        kind = flags["out_norm"]
        if kind == "none":
            return y
        if kind == "ln":
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm")(y)
            return out
        if kind == "dwconv3":
            return nn.Conv(
                self.d_inner, (3, 3), padding=[(1, 1), (1, 1)],
                feature_group_count=self.d_inner, use_bias=False,
                kernel_init=torch_default, name="out_norm",
                precision=jax.lax.Precision.HIGHEST,
            )(y)
        if kind == "softmax":
            B, H, W, C = y.shape
            return jax.nn.softmax(y.reshape(B, H * W, C), axis=1).reshape(y.shape)
        if kind == "sigmoid":
            return nn.sigmoid(y)
        raise ValueError(kind)

    def _core(self, x, flags):
        """4-direction cross selective scan on (B, H, W, d_inner).

        Equivalent to ``cross_selective_scan`` (``vmamba_layers.py:200-299``)
        with three TPU-first restructurings:

        1. The projections run AFTER the direction permutations but ON the
           permuted *input* (they commute — see module docstring): x is
           permuted ONCE per raster direction, straight into the scan
           kernel's interleaved chunk layout, and every kernel operand
           (u, dt, B, C) is then *born* in kernel layout from position-wise
           matmuls — no per-operand relayout copies at all
           (``pre_interleaved=True``).
        2. Directions 2/3 (the flipped rasters) are never materialized: they
           reuse direction-0/1 operand layouts and run the scan kernel in
           ``reverse=True`` mode (right-to-left grid+chunk traversal) —
           mathematically identical to flip/scan/flip but moves zero data.
        3. The 4-direction merge is a pointwise add in kernel layout plus
           one inverse permutation per raster.
        4. Dense path only: the two directions sharing a raster (k and k+2)
           run as separate per-raster calls on the raster's own (B, D, L)
           operands instead of one stacked (B, 2D, L) pair call — the stack/
           concat materialization around the custom calls disappears
           (measured -2.9 ms per core fwd+bwd at (4, 128, 128, 192)).  The
           sharded paths (seq/tp) keep the stacked pair form their shard_map
           wrappers partition.
        """
        B, H, W, D = x.shape
        K, N, R = K_DIRS, self.d_state, self.rank
        L = H * W
        x_proj, dt_w, dt_b, A_logs, Ds = self._ssm_params()

        seq = self.seq_axis is not None and self.seq_mesh is not None
        tp = self.tp_axis is not None and self.seq_mesh is not None
        if seq and tp:
            raise ValueError(
                "seq_axis and tp_axis both shard the same scan call; "
                "pick one (they compose with data_axis, not each other)")
        if seq:
            # sequence-parallel: chunks are sized for the PER-DEVICE length
            # so neither interleave groups nor kernel chunks span devices
            ndev = self.seq_mesh.shape[self.seq_axis]
            if L % ndev != 0:
                raise ValueError(f"L={L} not divisible by {self.seq_axis}={ndev}")
            Lloc = L // ndev
            T = scan_chunk_for(Lloc, self.scan_chunk)
            pre = Lloc % T == 0
        else:
            T = scan_chunk_for(L, self.scan_chunk)
            pre = L % T == 0  # kernel layout needs whole chunks (no padding)

        pd = jnp.dtype(self.proj_dtype) if self.proj_dtype else None
        cast = (lambda t: t.astype(pd)) if pd is not None else (lambda t: t)
        sod = jnp.dtype(self.ssm_out_dtype) if self.ssm_out_dtype else jnp.float32

        A = -jnp.exp(A_logs.astype(jnp.float32)) # (4D, N), k-major rows
        Ds32 = Ds.astype(jnp.float32)
        bias = dt_b.reshape(-1).astype(jnp.float32)

        if not (seq or tp):
            # dense path: PER-RASTER split calls.  Each raster permutation of
            # x feeds BOTH its forward direction (k = 0 row / 1 col) and its
            # reversed direction (k = 2 / 3, realized by the kernel's reverse
            # traversal on the SAME operands) — so operands are born in the
            # custom call's exact layout and no (B, 2, D, L) direction stack
            # is ever materialized.  Measured on-chip vs the stacked-pair
            # form at (4, 128, 128, 192): 28.4 -> 25.5 ms per core fwd+bwd
            # (the stack/concat fusions disappear); value/grad identical.
            y = None
            for i, col in enumerate((False, True)):
                xr = raster_to_kernel(x, T, col=col, ilv=pre)  # (B, D, L)
                # one matmul projects dt/B/C for BOTH directions of this
                # raster (w rows k = i forward, k = i + 2 reversed,
                # ``csm_triton.py:20-24``)
                w2 = jnp.concatenate([x_proj[i], x_proj[i + 2]], axis=0)
                xd = jnp.einsum(
                    "bdl,cd->bcl", cast(xr), cast(w2),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                dts_f, Bs_f, Cs_f, dts_r, Bs_r, Cs_r = jnp.split(
                    xd, [R, R + N, R + 2 * N, 2 * R + 2 * N, 2 * R + 3 * N],
                    axis=1,
                )
                delta_f, delta_r = (
                    jnp.einsum(
                        "brl,dr->bdl", cast(dts), cast(dt_w[k]),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)
                    for dts, k in ((dts_f, i), (dts_r, i + 2))
                )
                u = xr
                if flags["force_fp32"]:
                    u = u.astype(jnp.float32)
                    delta_f, delta_r = (
                        delta_f.astype(jnp.float32), delta_r.astype(jnp.float32))
                    Bs_f, Bs_r = Bs_f.astype(jnp.float32), Bs_r.astype(jnp.float32)
                    Cs_f, Cs_r = Cs_f.astype(jnp.float32), Cs_r.astype(jnp.float32)

                def dscan(delta, Bm, Cm, k, reverse, y_accum=None):
                    return selective_scan(
                        u, delta, A[k * D : (k + 1) * D],
                        Bm[:, None], Cm[:, None],
                        D=Ds32[k * D : (k + 1) * D],
                        delta_bias=bias[k * D : (k + 1) * D],
                        delta_softplus=True,
                        out_dtype=sod,
                        backend=self.scan_backend,
                        chunk=self.scan_chunk,
                        reverse=reverse,
                        pre_interleaved=pre,
                        y_accum=y_accum,
                    )

                # the reversed direction's call accumulates the forward's
                # output in its kernel epilogue (y_accum): the per-raster
                # merge costs no extra HBM pass
                ys_f = dscan(delta_f, Bs_f, Cs_f, i, False)
                ys = dscan(delta_r, Bs_r, Cs_r, i + 2, True, y_accum=ys_f)
                yr = kernel_to_raster(ys, H, W, T, col=col, ilv=pre)
                y = yr if y is None else y + yr
            y = self._out_norm(y, flags)
            return y.astype(x.dtype)

        # sharded paths (seq xor tp): stacked direction pairs — the shard_map
        # wrappers shard the (2D)-channel / G=2-group operands as one call
        # per scan orientation.  ONE fused permutation per raster direction
        # of the input (channel move + raster + chunk interleave compose);
        # the projections below are position-wise, so their outputs inherit
        # the layout.
        x2 = jnp.stack(
            [
                raster_to_kernel(x, T, col=False, ilv=pre),
                raster_to_kernel(x, T, col=True, ilv=pre),
            ],
            axis=1,
        )  # (B, 2, D, L)

        def project(w, dtw):
            # (dt, B, C) for one scan direction pair; w: (2, C', D) rows of
            # x_proj, dtw: (2, D, R) rows of dt_w (direction order k = 0 row,
            # 1 col, 2 row-reversed, 3 col-reversed, ``csm_triton.py:20-24``)
            xd = jnp.einsum(
                "bgdl,gcd->bgcl", cast(x2), cast(w),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            dts, Bs, Cs = jnp.split(xd, [R, R + N], axis=-2)
            dts = jnp.einsum(
                "bgrl,gdr->bgdl", cast(dts), cast(dtw),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            return dts.reshape(B, 2 * D, L), Bs, Cs

        delta_f, Bs_f, Cs_f = project(x_proj[:2], dt_w[:2])
        delta_r, Bs_r, Cs_r = project(x_proj[2:], dt_w[2:])

        u2 = x2.reshape(B, 2 * D, L)
        if flags["force_fp32"]:
            u2 = u2.astype(jnp.float32)
            delta_f, delta_r = delta_f.astype(jnp.float32), delta_r.astype(jnp.float32)
            Bs_f, Bs_r = Bs_f.astype(jnp.float32), Bs_r.astype(jnp.float32)
            Cs_f, Cs_r = Cs_f.astype(jnp.float32), Cs_r.astype(jnp.float32)

        if seq:
            from focalnet_tpu.parallel.seq_scan import selective_scan_seq_sharded

            scan = lambda delta, Bm, Cm, lo, reverse: selective_scan_seq_sharded(
                u2, delta, A[lo : lo + 2 * D], Bm, Cm,
                D=Ds32[lo : lo + 2 * D],
                delta_bias=bias[lo : lo + 2 * D],
                delta_softplus=True,
                out_dtype=sod,
                backend=self.scan_backend,
                chunk=self.scan_chunk,
                reverse=reverse,
                pre_interleaved=pre,
                mesh=self.seq_mesh,
                axis=self.seq_axis,
                batch_axis=self.data_axis,
            )
        elif tp:
            from focalnet_tpu.parallel.tp_scan import selective_scan_tp

            scan = lambda delta, Bm, Cm, lo, reverse, y_accum=None: selective_scan_tp(
                u2, delta, A[lo : lo + 2 * D], Bm, Cm,
                D=Ds32[lo : lo + 2 * D],
                delta_bias=bias[lo : lo + 2 * D],
                delta_softplus=True,
                out_dtype=sod,
                backend=self.scan_backend,
                chunk=self.scan_chunk,
                reverse=reverse,
                pre_interleaved=pre,
                y_accum=y_accum,
                mesh=self.seq_mesh,
                axis=self.tp_axis,
                batch_axis=self.data_axis,
            )
        if seq:
            ys_f = scan(delta_f, Bs_f, Cs_f, 0, False).reshape(B, 2, D, L)
            ys = (
                scan(delta_r, Bs_r, Cs_r, 2 * D, True).reshape(B, 2, D, L)
                + ys_f
            )
        else:  # tp
            # the reverse-pair call accumulates the forward pair's output in
            # its kernel epilogue: the 4-direction merge costs no extra HBM
            # pass (y_accum, ops/pallas_scan.py)
            ys_f = scan(delta_f, Bs_f, Cs_f, 0, False)
            ys = scan(delta_r, Bs_r, Cs_r, 2 * D, True, y_accum=ys_f).reshape(
                B, 2, D, L
            )

        # one fused inverse permutation per raster (both rasters already
        # aligned — no un-flips)
        y = kernel_to_raster(ys[:, 0], H, W, T, col=False, ilv=pre)
        y = y + kernel_to_raster(ys[:, 1], H, W, T, col=True, ilv=pre)
        y = self._out_norm(y, flags)
        return y.astype(x.dtype)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, H, W, d_model) -> (B, H, W, d_model)."""
        flags = parse_forward_type(self.forward_type)
        d_inner = self.d_inner
        d_proj = d_inner if flags["disable_z"] else 2 * d_inner
        act = _ACTS[self.act]

        h = nn.Dense(
            d_proj, use_bias=self.bias,
            kernel_init=trunc_normal_02, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="in_proj",
        )(x)
        if not flags["disable_z"]:
            h, z = jnp.split(h, 2, axis=-1)
            if not flags["disable_z_act"]:
                z = act(z)
        if self.d_conv > 1:
            pad = (self.d_conv - 1) // 2
            # precision=HIGHEST keeps the depthwise conv in fp32: under the
            # default precision XLA converts the operands to bf16 and its
            # bf16 grouped-conv fusion strategy degrades ~11x beyond linear
            # scaling at batch 8 (profiled [8,64,64,192]: 3.3 ms vs 0.11 ms
            # fp32).  A grouped conv never touches the MXU, so fp32 costs
            # nothing here.
            h = nn.Conv(
                d_inner, (self.d_conv, self.d_conv),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=d_inner, use_bias=self.conv_bias,
                kernel_init=torch_default,
                bias_init=torch_bias_init(self.d_conv * self.d_conv),
                dtype=self.dtype, name="conv2d",
                precision=jax.lax.Precision.HIGHEST,
            )(h)
        h = act(h)

        y = self._core(h, flags)

        if not flags["disable_z"]:
            y = y * z
        out = nn.Dense(
            self.d_model, use_bias=self.bias,
            kernel_init=trunc_normal_02, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="out_proj",
        )(y)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
