"""Selective-scan parity tests: every backend vs the sequential oracle.

Replicates the reference's kernel test strategy
(``/root/reference/kernels/selective_scan/test_selective_scan.py:373-502``):
parametrized sweep over dtype x seqlen x has_D x has_delta_bias x
delta_softplus x groups, with a dtype-scaled tolerance ladder, forward checks
then gradient checks per input tensor.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalnet_tpu.ops import (
    selective_scan_assoc,
    selective_scan_chunked,
    selective_scan_ref,
)
from focalnet_tpu.ops.pallas_scan import selective_scan_pallas
from focalnet_tpu.ops.scan_matrix import selective_scan_matrix

# tolerance ladder mirroring test_selective_scan.py:398-400
TOLS = {
    jnp.float32: dict(rtol=6e-4, atol=2e-3),
    jnp.float16: dict(rtol=3e-3, atol=5e-3),
    jnp.bfloat16: dict(rtol=3e-2, atol=5e-2),
}


def make_inputs(key, batch, dim, N, L, G, itype, has_D, has_bias):
    ks = jax.random.split(key, 7)
    u = (jax.random.normal(ks[0], (batch, dim, L)) * 0.5).astype(itype)
    delta = (0.5 * jax.random.uniform(ks[1], (batch, dim, L))).astype(itype)
    A = -0.5 - jax.random.uniform(ks[2], (dim, N)) * 2.0  # A < 0
    B = (jax.random.normal(ks[3], (batch, G, N, L)) * 0.5).astype(itype)
    C = (jax.random.normal(ks[4], (batch, G, N, L)) * 0.5).astype(itype)
    D = jax.random.normal(ks[5], (dim,)) if has_D else None
    bias = 0.3 * jax.random.normal(ks[6], (dim,)) if has_bias else None
    return u, delta, A, B, C, D, bias


BACKENDS = {
    "assoc": selective_scan_assoc,
    "chunked": selective_scan_chunked,
    "pallas": selective_scan_pallas,
    # the reference's tril-mask chunk-matrix formulation
    # (test_selective_scan_easy.py:391-466, SelectiveScanMatrix:594).
    # chunk=16 keeps make_inputs' adversarial dt/A (|A|*sum dt per chunk up
    # to ~36) inside the factored form's fp32 stability domain (~80, see
    # ops/scan_matrix.py) — the trained model's dt range is safe at the
    # reference default of 64.
    "matrix": functools.partial(selective_scan_matrix, chunk=16),
}


@pytest.mark.parametrize("backend", list(BACKENDS))
@pytest.mark.parametrize("itype", [jnp.float32, jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("L", [64, 256, 1024])
@pytest.mark.parametrize("has_D,has_bias,softplus", [
    (True, True, True),
    (False, False, False),
    (True, False, True),
])
@pytest.mark.parametrize("G", [1, 4])
def test_forward_parity(backend, itype, L, has_D, has_bias, softplus, G):
    batch, dim, N = 2, 8 * G, 8
    key = jax.random.PRNGKey(0)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, itype, has_D, has_bias
    )
    ref = selective_scan_ref(u, delta, A, B, C, D, bias, softplus)
    got = BACKENDS[backend](u, delta, A, B, C, D, bias, softplus)
    tol = TOLS[itype]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


@pytest.mark.parametrize("backend", ["chunked", "pallas", "matrix"])
@pytest.mark.parametrize("itype", [jnp.float32])
@pytest.mark.parametrize("L", [128, 320])
def test_gradient_parity(backend, itype, L):
    batch, G, N = 2, 2, 4
    dim = 4 * G
    key = jax.random.PRNGKey(1)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, itype, True, True
    )

    def loss(fn):
        def f(u, delta, A, B, C, D, bias):
            y = fn(u, delta, A, B, C, D, bias, True)
            # weighted sum so gradients differ per position
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
            return jnp.sum(y * jnp.sin(w))
        return f

    args = (u, delta, A, B, C, D, bias)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=tuple(range(7)))(*args)
    g_got = jax.grad(loss(BACKENDS[backend]), argnums=tuple(range(7)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, r, g in zip(names, g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-3, atol=5e-3, err_msg=name
        )


# gradient tolerance ladder: the reference widens per-tensor grad tolerances
# by ~2-10x over the forward ones (test_selective_scan.py:490-502)
GRAD_TOLS = {
    jnp.float16: dict(rtol=1e-2, atol=5e-2),
    jnp.bfloat16: dict(rtol=5e-2, atol=2e-1),
}


@pytest.mark.parametrize("backend", ["chunked", "pallas"])
@pytest.mark.parametrize("itype", [jnp.float16, jnp.bfloat16])
def test_gradient_parity_reduced_precision(backend, itype):
    """Grads with fp16/bf16 inputs vs the fp32 oracle, with the reference's
    widened tolerance ladder (``test_selective_scan.py:373-400,490-502``:
    itype sweeps fp32/fp16/bf16 through the gradient checks too)."""
    batch, G, N, L = 2, 2, 4, 256
    dim = 4 * G
    key = jax.random.PRNGKey(4)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, itype, True, True
    )

    def loss(fn):
        def f(u, delta, A, B, C, D, bias):
            y = fn(u, delta, A, B, C, D, bias, True)
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
            return jnp.sum(y.astype(jnp.float32) * jnp.sin(w))
        return f

    # oracle runs on fp32 copies of the same values
    args32 = tuple(
        t.astype(jnp.float32) if t is not None and t.dtype == itype else t
        for t in (u, delta, A, B, C, D, bias)
    )
    g_ref = jax.grad(loss(selective_scan_ref), argnums=tuple(range(7)))(*args32)
    g_got = jax.grad(loss(BACKENDS[backend]), argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias
    )
    tol = GRAD_TOLS[itype]
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, r, g in zip(names, g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(g, dtype=np.float32), np.asarray(r), err_msg=name, **tol
        )


@pytest.mark.parametrize("backend", ["chunked", "pallas"])
@pytest.mark.parametrize("itype", [jnp.float32, jnp.bfloat16])
def test_bf16_out_dtype_values_and_grads(backend, itype):
    """``out_dtype=bfloat16`` (the model's ``ssm_out_dtype`` knob): y comes
    back bf16, values match the fp32-out path to one rounding, and the
    backward consumes the bf16 dy directly — on the pallas backend there is
    no host-side upcast in front of the custom call (the kernel upcasts per
    tile in VMEM); grads track the fp32-out grads within the bf16 ladder.
    The reference's oflex contract is fp32-out (``cusoflex/selective_scan_
    oflex.cpp:164,234-240``); bf16-out is the TPU build's opt-in HBM saver.
    """
    batch, G, N, L = 2, 2, 4, 256
    dim = 4 * G
    key = jax.random.PRNGKey(6)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, itype, True, True
    )
    fn = BACKENDS[backend]

    y16 = fn(u, delta, A, B, C, D, bias, True, out_dtype=jnp.bfloat16)
    y32 = fn(u, delta, A, B, C, D, bias, True)
    assert y16.dtype == jnp.bfloat16 and y32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16, dtype=np.float32),
                               np.asarray(y32), rtol=3e-2, atol=5e-2)

    def loss(out_dtype):
        def f(u, delta, A, B, C, D, bias):
            y = fn(u, delta, A, B, C, D, bias, True, out_dtype=out_dtype)
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
            return jnp.sum(y.astype(jnp.float32) * jnp.sin(w))
        return f

    args = (u, delta, A, B, C, D, bias)
    g32 = jax.grad(loss(jnp.float32), argnums=tuple(range(7)))(*args)
    g16 = jax.grad(loss(jnp.bfloat16), argnums=tuple(range(7)))(*args)
    tol = GRAD_TOLS[jnp.bfloat16]
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, r, g in zip(names, g32, g16):
        assert g.dtype == r.dtype, name  # cotangents keep the input dtypes
        np.testing.assert_allclose(
            np.asarray(g, dtype=np.float32),
            np.asarray(r, dtype=np.float32), err_msg=name, **tol
        )


@pytest.mark.parametrize("L", [2048, 4096])
def test_forward_parity_long_sequence(L):
    """Long-L forward vs the oracle (reference sweeps seqlen up to 4096,
    ``test_selective_scan.py:376``); small dims keep CPU time sane."""
    batch, dim, N, G = 1, 4, 4, 1
    key = jax.random.PRNGKey(5)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    ref = selective_scan_ref(u, delta, A, B, C, D, bias, True)
    got = selective_scan_pallas(u, delta, A, B, C, D, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=6e-4, atol=2e-3)


@pytest.mark.parametrize("L", [100, 130])  # not multiples of the 16-chunk
def test_matrix_backend_ragged_length(L):
    """The matrix formulation pads ragged chunks with dt=0 (identity: flat
    decay, zero v) — values and the carried state must match the oracle."""
    batch, dim, N, G = 2, 8, 8, 2
    key = jax.random.PRNGKey(11)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    ref, h_ref = selective_scan_ref(u, delta, A, B, C, D, bias, True,
                                    return_last_state=True)
    got, h_got = selective_scan_matrix(u, delta, A, B, C, D, bias, True,
                                       return_last_state=True, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=6e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               rtol=6e-4, atol=2e-3)


def test_ndstate_specialization():
    """N == 1 path: the reference's selective_scan_cuda_ndstate semantics."""
    batch, dim, L, G = 2, 8, 128, 1
    key = jax.random.PRNGKey(2)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, 1, L, G, jnp.float32, True, True
    )
    ref = selective_scan_ref(u, delta, A, B, C, D, bias, True)
    got = selective_scan_pallas(u, delta, A, B, C, D, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=6e-4, atol=2e-3)


def test_last_state():
    batch, dim, N, L, G = 2, 8, 8, 96, 1
    key = jax.random.PRNGKey(3)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    _, hs_ref = selective_scan_ref(u, delta, A, B, C, D, bias, True, return_last_state=True)
    _, hs_chk = selective_scan_chunked(u, delta, A, B, C, D, bias, True, return_last_state=True)
    np.testing.assert_allclose(np.asarray(hs_chk), np.asarray(hs_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("itype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("L", [96, 192, 256, 1024])
def test_reverse_forward_parity(itype, L):
    """reverse=True == flip/scan/flip on the oracle (the flip-free mode
    SS2D's directions 2/3 use; no reference analogue — the CUDA build always
    materializes flipped copies via CrossScanTriton, ``csm_triton.py:20-24``)."""
    batch, dim, N, G = 2, 8, 8, 2
    key = jax.random.PRNGKey(7)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, itype, True, True
    )
    flip = lambda t: jnp.flip(t, axis=-1)
    ref = flip(
        selective_scan_ref(flip(u), flip(delta), A, flip(B), flip(C), D, bias, True)
    )
    got = selective_scan_pallas(u, delta, A, B, C, D, bias, True, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOLS[itype])


@pytest.mark.parametrize("reverse", [False, True])
def test_reverse_gradient_parity(reverse):
    """Gradients of the reverse-mode kernel vs the flip-oracle."""
    batch, dim, N, L, G = 1, 8, 4, 256, 1
    key = jax.random.PRNGKey(8)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    flip = lambda t: jnp.flip(t, axis=-1)

    def loss_pallas(u, delta, B, C):
        y = selective_scan_pallas(u, delta, A, B, C, D, bias, True, reverse=reverse)
        return jnp.sum(y * jnp.cos(y))

    def loss_ref(u, delta, B, C):
        if reverse:
            u, delta, B, C = flip(u), flip(delta), flip(B), flip(C)
        y = selective_scan_ref(u, delta, A, B, C, D, bias, True)
        if reverse:
            y = flip(y)
        return jnp.sum(y * jnp.cos(y))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(u, delta, B, C)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(u, delta, B, C)
    for name, g, r in zip("u delta B C".split(), gp, gr):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-3, atol=5e-3, err_msg=name
        )


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L", [256, 1024])
def test_pre_interleaved_contract(reverse, L):
    """pre_interleaved=True: interleaved-in/interleaved-out equals
    interleave(plain scan) for values AND gradients (the layout contract
    SS2D relies on to fuse its operand permutations at the source)."""
    from focalnet_tpu.ops.pallas_scan import interleave, scan_chunk_for

    batch, dim, N, G = 1, 8, 4, 2
    key = jax.random.PRNGKey(9)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    T = scan_chunk_for(L)
    ilv = lambda t: interleave(t, T)

    def loss_pre(u_i, delta_i, B_i, C_i):
        y = selective_scan_pallas(
            u_i, delta_i, A, B_i, C_i, D, bias, True,
            reverse=reverse, pre_interleaved=True,
        )
        return jnp.sum(y * jnp.sin(y)), y

    def loss_plain(u, delta, B, C):
        y = ilv(selective_scan_pallas(
            u, delta, A, B, C, D, bias, True, reverse=reverse,
        ))
        return jnp.sum(y * jnp.sin(y)), y

    (lp, yp), gp = jax.value_and_grad(loss_pre, argnums=(0, 1, 2, 3), has_aux=True)(
        ilv(u), ilv(delta), ilv(B), ilv(C)
    )
    (lr, yr), gr = jax.value_and_grad(loss_plain, argnums=(0, 1, 2, 3), has_aux=True)(
        u, delta, B, C
    )
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-6)
    for name, g, r in zip("u delta B C".split(), gp, gr):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ilv(r)), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_pre_interleaved_rejects_ragged_L():
    """The layout contract requires whole chunks."""
    batch, dim, N, L, G = 1, 4, 4, 200, 1
    key = jax.random.PRNGKey(10)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    with pytest.raises(ValueError, match="pre_interleaved"):
        selective_scan_pallas(
            u, delta, A, B, C, D, bias, True, pre_interleaved=True
        )


def test_pre_interleaved_oracle_shim():
    """The dispatcher de/re-interleaves for oracle backends, so a caller in
    kernel layout gets identical results from any backend."""
    from focalnet_tpu.ops.pallas_scan import interleave, scan_chunk_for
    from focalnet_tpu.ops.selective_scan import selective_scan

    batch, dim, N, L, G = 1, 8, 4, 256, 1
    key = jax.random.PRNGKey(11)
    u, delta, A, B, C, D, bias = make_inputs(
        key, batch, dim, N, L, G, jnp.float32, True, True
    )
    T = scan_chunk_for(L)
    ilv = lambda t: interleave(t, T)
    args = (ilv(u), ilv(delta), A, ilv(B), ilv(C))
    kw = dict(D=D, delta_bias=bias, delta_softplus=True, pre_interleaved=True)
    yp = selective_scan(*args, backend="pallas", **kw)
    yc = selective_scan(*args, backend="chunked", **kw)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yc), rtol=6e-4, atol=2e-3)


@pytest.mark.parametrize("H,W,T", [
    (128, 128, 2048),  # composed, R=16 (model full-res)
    (64, 64, 2048),    # composed, chunk spans many rows/cols
    (32, 32, 1024),    # composed, R=8 (model low-res)
    (16, 24, 128),     # composed row (T%24!=0 -> col falls back)
    (8, 8, 128),       # L < T: plain raster fallback (pre-layout unusable)
    (80, 112, 256),    # eval-padded rectangle: H∤T -> col fallback
])
@pytest.mark.parametrize("col", [False, True])
def test_raster_to_kernel_roundtrip(H, W, T, col):
    """The fused NHWC->kernel-layout permutation equals the two-step
    reference (raster transpose + interleave) and round-trips exactly."""
    from focalnet_tpu.ops.pallas_scan import (
        interleave, kernel_to_raster, raster_to_kernel,
    )

    B, D, L = 2, 3, H * W
    x = jnp.arange(B * H * W * D, dtype=jnp.float32).reshape(B, H, W, D)
    got = raster_to_kernel(x, T, col)
    # two-step reference
    xt = jnp.swapaxes(x.reshape(B, L, D), 1, 2)
    if col:
        xt = jnp.swapaxes(xt.reshape(B, D, H, W), 2, 3).reshape(B, D, L)
    ref = interleave(xt, T) if L % T == 0 else xt
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    back = kernel_to_raster(got, H, W, T, col)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("backend", ["pallas", "chunked", "assoc", "ref", "matrix"])
@pytest.mark.parametrize("reverse", [False, True])
def test_segment_api_chaining(backend, reverse):
    """h0/return_state (the segment API): scanning two halves chained by the
    carried state must equal the one-shot scan, on every backend and in both
    directions.  This is the building block of the sequence-sharded scan."""
    from focalnet_tpu.ops.selective_scan import selective_scan as scan

    u, delta, A, B, C, D, bias = make_inputs(
        jax.random.PRNGKey(21), 2, 8, 4, 256, 1, jnp.float32, True, True
    )
    # matrix backend: keep the adversarial inputs in its stability domain
    ckw = {"chunk": 16} if backend == "matrix" else {}
    full, h_full = scan(u, delta, A, B, C, D=D, delta_bias=bias,
                        delta_softplus=True, backend=backend,
                        reverse=reverse, return_state=True, **ckw)
    halves = [slice(0, 128), slice(128, 256)]
    if reverse:
        halves = halves[::-1]
    h = None
    ys = {}
    for sl in halves:
        ys[sl.start], h = scan(
            u[..., sl], delta[..., sl], A, B[..., sl], C[..., sl],
            D=D, delta_bias=bias, delta_softplus=True, backend=backend,
            reverse=reverse, h0=h, return_state=True, **ckw,
        )
    y2 = jnp.concatenate([ys[0], ys[128]], axis=-1)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("L", [128, 192])  # 192: padded tail in the kernel
@pytest.mark.parametrize("reverse", [False, True])
def test_segment_api_gradients(L, reverse):
    """Gradients THROUGH h0 and h_last (pallas vs sequential oracle), with
    and without kernel-internal padding.  The VJP seeds the adjoint carry
    with the h_last cotangent and emits dh0 from the adjoint's leaving state."""
    from focalnet_tpu.ops.selective_scan import selective_scan as scan

    u, delta, A, B, C, D, bias = make_inputs(
        jax.random.PRNGKey(23), 2, 8, 4, L, 1, jnp.float32, True, True
    )
    h0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 4)) * 0.3

    def loss(be):
        def f(u, delta, A, B, C, D, bias, h0):
            y, hl = scan(u, delta, A, B, C, D=D, delta_bias=bias,
                         delta_softplus=True, backend=be, reverse=reverse,
                         h0=h0, return_state=True)
            return jnp.sum(y * jnp.cos(y * 0.1)) + jnp.sum(hl * jnp.sin(hl))
        return jax.grad(f, argnums=tuple(range(8)))(
            u, delta, A, B, C, D, bias, h0
        )

    gp = loss("pallas")
    gr = loss("ref")
    names = ("du", "ddelta", "dA", "dB", "dC", "dD", "dbias", "dh0")
    for name, a, b in zip(names, gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5,
            err_msg=f"L={L} reverse={reverse} {name}",
        )


@pytest.mark.parametrize("backend", ["pallas", "chunked"])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L", [256, 192])  # 192: padded tail in the kernel
def test_y_accum_fusion(backend, reverse, L):
    """``y_accum`` (the in-kernel 4-direction merge add) must equal
    scan-then-add in values AND in every gradient, including the y_accum
    cotangent (which is dy verbatim)."""
    from focalnet_tpu.ops.selective_scan import selective_scan as scan

    u, delta, A, B, C, D, bias = make_inputs(
        jax.random.PRNGKey(29), 2, 8, 4, L, 1, jnp.float32, True, True
    )
    ya = jax.random.normal(jax.random.PRNGKey(30), u.shape)

    def loss(fused):
        def f(u, ya):
            kw = dict(D=D, delta_bias=bias, delta_softplus=True,
                      backend=backend, reverse=reverse)
            if fused:
                y = scan(u, delta, A, B, C, y_accum=ya, **kw)
            else:
                y = scan(u, delta, A, B, C, **kw) + ya
            return jnp.sum(y * jnp.cos(y * 0.1))
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(u, ya)
        return val, grads

    v1, (du1, dya1) = loss(False)
    v2, (du2, dya2) = loss(True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(du1), np.asarray(du2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dya1), np.asarray(dya2),
                               rtol=1e-6, atol=1e-6)


def test_y_accum_pre_interleaved():
    """y_accum composes with the pre_interleaved layout contract: feeding the
    forward-pair output (interleaved) into the reverse-pair call matches the
    deinterleaved scan-then-add oracle."""
    from focalnet_tpu.ops.pallas_scan import interleave, deinterleave, scan_chunk_for
    from focalnet_tpu.ops.selective_scan import selective_scan as scan

    L = 256
    T = scan_chunk_for(L)
    u, delta, A, B, C, D, bias = make_inputs(
        jax.random.PRNGKey(31), 2, 8, 4, L, 1, jnp.float32, True, True
    )
    kw = dict(D=D, delta_bias=bias, delta_softplus=True, backend="pallas")
    ilv = lambda x: interleave(x, T)

    y_f = scan(ilv(u), ilv(delta), A, ilv(B), ilv(C),
               pre_interleaved=True, **kw)
    y = scan(ilv(u), ilv(delta), A, ilv(B), ilv(C),
             pre_interleaved=True, reverse=True, y_accum=y_f, **kw)

    ref = (scan(u, delta, A, B, C, **kw)
           + scan(u, delta, A, B, C, reverse=True, **kw))
    np.testing.assert_allclose(np.asarray(deinterleave(y, T)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
