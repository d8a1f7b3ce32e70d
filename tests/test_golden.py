"""Golden-value regression tests: fixed-seed tiny forwards snapshotted so
unintended numerics changes (init laws, layer order, scan math) are caught.
The reference has no such tests (SURVEY.md §4 implication)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from focalnet_tpu.models import build_net
from focalnet_tpu.ops.scan_ref import selective_scan_ref

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_scan_golden():
    """Hand-checkable tiny case: dim=1, N=1, L=3, no D/bias/softplus.

    h1 = e^{dA*dt1} * 0 + dt1*B1*u1; y1 = C1*h1; etc. — values derived from
    the recurrence by hand.
    """
    u = jnp.asarray([[[1.0, 2.0, 3.0]]])
    delta = jnp.asarray([[[0.5, 0.5, 1.0]]])
    A = jnp.asarray([[-1.0]])
    B = jnp.asarray([[[[1.0, 1.0, 0.5]]]])
    C = jnp.asarray([[[[1.0, 0.5, 2.0]]]])
    y = np.asarray(selective_scan_ref(u, delta, A, B, C))

    a1, b1 = np.exp(-0.5), 0.5 * 1.0 * 1.0
    h1 = b1
    a2, b2 = np.exp(-0.5), 0.5 * 1.0 * 2.0
    h2 = a2 * h1 + b2
    a3, b3 = np.exp(-1.0), 1.0 * 0.5 * 3.0
    h3 = a3 * h2 + b3
    want = np.asarray([[[1.0 * h1, 0.5 * h2, 2.0 * h3]]])
    np.testing.assert_allclose(y, want, rtol=1e-6)


def _tiny_model_outputs():
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    x = jnp.linspace(0, 1, 1 * 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
    params = model.init({"params": jax.random.PRNGKey(1234)}, x)
    return model.apply(params, x)


def test_model_forward_golden_stats():
    """Fixed-seed tiny flagship forward: output statistics snapshot
    (coarse fallback for hosts where the full-tensor compare is too strict).

    If this fails after an intentional change to init laws or layer
    structure, re-record the constants (they were produced by this exact
    code at the commit introducing the test).
    """
    outs = _tiny_model_outputs()
    stats = np.asarray(
        [[float(o.mean()), float(o.std())] for o in outs], dtype=np.float64
    )
    # recorded snapshot (CPU fp32, jax 0.8.x)
    want = np.asarray(RECORDED, dtype=np.float64)
    np.testing.assert_allclose(stats, want, rtol=2e-3, atol=2e-4)


def test_model_forward_golden_full_tensor():
    """Full-tensor snapshot of the tiny flagship forward.

    Strictly stronger than the stats test: a layer-order or init regression
    that happens to preserve output statistics still changes the tensors.
    Tolerance is 1e-5 (not exact equality) because XLA:CPU codegen varies
    slightly across host microarchitectures; any real regression moves the
    tensors by orders of magnitude more.  Regenerate
    ``tests/golden/tiny_golden.npz`` with the snippet in its sibling
    README if a change is intentional.
    """
    golden = np.load(os.path.join(_GOLDEN_DIR, "tiny_golden.npz"))
    outs = _tiny_model_outputs()
    for i, o in enumerate(outs):
        np.testing.assert_allclose(
            np.asarray(o), golden[f"out{i}"], rtol=1e-5, atol=1e-5,
            err_msg=f"output {i}",
        )


def test_scan_golden_full_tensor():
    """Full-tensor snapshot of one selective-scan output (softplus path)."""
    golden = np.load(os.path.join(_GOLDEN_DIR, "tiny_golden.npz"))
    ks = jax.random.split(jax.random.PRNGKey(42), 5)
    u = jax.random.normal(ks[0], (2, 8, 64)) * 0.5
    delta = jax.random.uniform(ks[1], (2, 8, 64))
    A = -1.0 - jax.random.uniform(ks[2], (8, 4))
    B = jax.random.normal(ks[3], (2, 1, 4, 64)) * 0.5
    C = jax.random.normal(ks[4], (2, 1, 4, 64)) * 0.5
    y = selective_scan_ref(u, delta, A, B, C, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), golden["scan"], rtol=1e-6, atol=1e-6)


# recorded on CPU fp32 (jax 0.8.x) at the commit introducing this test
RECORDED = [
    [0.4779943823814392, 0.5417346954345703],
    [0.46152573823928833, 0.44449782371520996],
    [0.5701711177825928, 0.47630253434181213],
]
