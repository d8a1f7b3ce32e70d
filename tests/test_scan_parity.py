"""Selective-scan parity tests: every backend vs the sequential oracle.

Replicates the reference's kernel test strategy
(``/root/reference/kernels/selective_scan/test_selective_scan.py:373-502``):
parametrized sweep over dtype x seqlen x has_D x has_delta_bias x
delta_softplus x groups, with a dtype-scaled tolerance ladder, forward checks
then gradient checks per input tensor.
"""

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


@pytest.mark.parametrize("backend", ["chunked", "pallas"])
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
