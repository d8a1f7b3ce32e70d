"""Opt-in real-TPU tests (skipped on the CPU test mesh).

Run with:  FOCALNET_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py -q
(i.e. WITHOUT the conftest CPU override — these need the real chip, where
the Pallas kernel runs compiled rather than interpreted.)

Note tests/conftest.py forces CPU for the main suite; this file re-checks the
actual backend at runtime and skips unless it's TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


def test_pallas_model_shape_parity_on_hw():
    """Compiled (Mosaic) kernel vs oracle at the live model's hot shape."""
    from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
    from focalnet_tpu.ops.scan_chunked import selective_scan_chunked

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    D, N, L = 768, 16, 4096
    u = (jax.random.normal(ks[0], (1, D, L)) * 0.5).astype(jnp.bfloat16)
    delta = (0.5 * jax.random.uniform(ks[1], (1, D, L))).astype(jnp.bfloat16)
    A = -0.5 - jax.random.uniform(ks[2], (D, N))
    B = (jax.random.normal(ks[3], (1, 4, N, L)) * 0.5).astype(jnp.bfloat16)
    C = (jax.random.normal(ks[4], (1, 4, N, L)) * 0.5).astype(jnp.bfloat16)

    got = jax.jit(lambda u, d: selective_scan_pallas(u, d, A, B, C,
                                                     delta_softplus=True))(u, delta)
    ref = selective_scan_chunked(u, delta, A, B, C, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=5e-2)


def test_pallas_backward_parity_on_hw():
    """Compiled (Mosaic) backward vs the chunked oracle at the hot shape.

    The reference gradient-checks every kernel on the real device
    (``kernels/selective_scan/test_selective_scan.py:490-502``); the CPU
    suite only exercises the backward in interpret mode, so this is the
    check that Mosaic compilation preserves the adjoint math.  fp32 and
    bf16-in/fp32-out (the live model's mixed-precision path).
    """
    from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
    from focalnet_tpu.ops.scan_chunked import selective_scan_chunked

    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    D, N, G, L = 768, 16, 4, 16384
    for dtype, rtol, atol in [(jnp.float32, 6e-4, 2e-3), (jnp.bfloat16, 3e-2, 5e-2)]:
        u = (jax.random.normal(ks[0], (1, D, L)) * 0.5).astype(dtype)
        delta = (0.5 * jax.random.uniform(ks[1], (1, D, L))).astype(dtype)
        A = -0.5 - jax.random.uniform(ks[2], (D, N))
        B = (jax.random.normal(ks[3], (1, G, N, L)) * 0.5).astype(dtype)
        C = (jax.random.normal(ks[4], (1, G, N, L)) * 0.5).astype(dtype)
        Dv = jax.random.normal(ks[5], (D,))
        bias = jax.random.normal(ks[6], (D,)) * 0.1

        def loss(fn, u, delta, A, B, C):
            y = fn(u, delta, A, B, C, D=Dv, delta_bias=bias, delta_softplus=True)
            return jnp.mean(y * jnp.cos(y))

        args = (u, delta, A, B, C)
        gp = jax.jit(jax.grad(
            lambda *a: loss(selective_scan_pallas, *a), argnums=(0, 1, 2, 3, 4)
        ))(*args)
        gr = jax.jit(jax.grad(
            lambda *a: loss(selective_scan_chunked, *a), argnums=(0, 1, 2, 3, 4)
        ))(*args)
        for name, got, ref in zip(("du", "ddelta", "dA", "dB", "dC"), gp, gr):
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=rtol, atol=atol, err_msg=f"{name} @ {dtype.__name__}",
            )


def test_flagship_forward_on_hw():
    from focalnet_tpu.models import build_net

    model = build_net("1mlp_g2")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    outs = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 64, 64, 3), (1, 128, 128, 3), (1, 256, 256, 3)
    ]
    for o in outs:
        assert bool(jnp.all(jnp.isfinite(o)))


def test_y_accum_fusion_on_hw():
    """Mosaic-compiled y_accum epilogue (the in-kernel 4-direction merge)
    vs scan-then-add, values and grads, at a full-res-core-like shape."""
    from focalnet_tpu.ops.selective_scan import selective_scan

    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    D, N, G, L = 384, 16, 2, 4096
    u = jax.random.normal(ks[0], (1, D, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (1, D, L))
    A = -0.5 - jax.random.uniform(ks[2], (D, N))
    B = jax.random.normal(ks[3], (1, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (1, G, N, L)) * 0.5
    Dv = jax.random.normal(ks[5], (D,))
    bias = jax.random.normal(ks[6], (D,)) * 0.1
    ya = jax.random.normal(ks[7], (1, D, L))

    def loss(fused):
        def f(u, ya):
            kw = dict(D=Dv, delta_bias=bias, delta_softplus=True,
                      backend="pallas", reverse=True)
            if fused:
                y = selective_scan(u, delta, A, B, C, y_accum=ya, **kw)
            else:
                y = selective_scan(u, delta, A, B, C, **kw) + ya
            return jnp.mean(y * jnp.cos(y * 0.1))
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(u, ya)

    v1, (du1, dya1) = loss(True)
    v2, (du2, dya2) = loss(False)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(du1), np.asarray(du2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dya1), np.asarray(dya2),
                               rtol=1e-4, atol=1e-5)


def test_depthwise_conv_stays_fp32_on_hw():
    """The SS2D depthwise conv must match an fp32 reference closely on the
    real chip — guards the precision=HIGHEST setting (without it XLA
    converts the grouped conv to bf16: ~4e-3 deviations AND a pathological
    batch-8 fusion strategy; NOTES r3 item 10)."""
    from flax import linen as nn

    class DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                x.shape[-1], (3, 3), padding=[(1, 1), (1, 1)],
                feature_group_count=x.shape[-1], use_bias=False,
                precision=jax.lax.Precision.HIGHEST,
            )(x)

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 192))
    m = DW()
    p = m.init({"params": jax.random.PRNGKey(1)}, x)
    got = jax.jit(m.apply)(p, x)
    w = p["params"]["Conv_0"]["kernel"]
    # fp32 reference: 9 shifted fused multiply-adds
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = sum(
        xp[:, i : i + 64, j : j + 64, :] * w[i, j, 0]
        for i in range(3) for j in range(3)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seq_scan_check_vma_on_pallas():
    """shard_map's check_vma stays ON for the COMPILED pallas path.

    vma is a trace-time type check, so a 1-device mesh fully exercises it:
    every pallas_call out_shape must declare its varying axes and replicated
    operands must be pvaried up to them (ops/pallas_scan.py::_out_vma /
    _lift_vma) or shard_map raises at trace time.  Values + grads vs the
    unsharded kernel.  (The CPU suite can't cover this: interpret-mode
    pallas evaluates the kernel body under vma typing, where kernel
    literals aren't pvaried — so check_vma is only disabled there.)
    """
    from jax.sharding import Mesh
    from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
    from focalnet_tpu.parallel.seq_scan import selective_scan_seq_sharded
    from focalnet_tpu.parallel.tp_scan import selective_scan_tp

    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    D, N, G, L = 64, 4, 2, 512
    u = jax.random.normal(ks[0], (2, D, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (2, D, L))
    A = -0.5 - jax.random.uniform(ks[2], (D, N))
    B = jax.random.normal(ks[3], (2, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (2, G, N, L)) * 0.5

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "seq"))
    for reverse in (False, True):
        def f_seq(u, delta, B, C):
            y = selective_scan_seq_sharded(
                u, delta, A, B, C, delta_softplus=True, mesh=mesh,
                axis="seq", batch_axis="data", backend="pallas",
                reverse=reverse)
            return jnp.sum(y * y), y

        def f_plain(u, delta, B, C):
            y = selective_scan_pallas(
                u, delta, A, B, C, delta_softplus=True, reverse=reverse)
            return jnp.sum(y * y), y

        (ls, ys), gs = jax.jit(jax.value_and_grad(f_seq, (0, 1), has_aux=True))(
            u, delta, B, C)
        (lp, yp), gp = jax.jit(jax.value_and_grad(f_plain, (0, 1), has_aux=True))(
            u, delta, B, C)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yp),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(gs, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    # tp path (sub-group sharding on the same 1-device mesh, axis size 1)
    mesh_tp = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    y_tp = jax.jit(lambda u, d, B, C: selective_scan_tp(
        u, d, A, B, C, delta_softplus=True, mesh=mesh_tp, axis="model",
        batch_axis="data", backend="pallas"))(u, delta, B, C)
    y_pl = jax.jit(lambda u, d, B, C: selective_scan_pallas(
        u, d, A, B, C, delta_softplus=True))(u, delta, B, C)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_pl),
                               rtol=1e-5, atol=1e-5)
