"""Golden-value regression tests: fixed-seed tiny forwards snapshotted so
unintended numerics changes (init laws, layer order, scan math) are caught.
The reference has no such tests (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np

from focalnet_tpu.models import build_net
from focalnet_tpu.ops.scan_ref import selective_scan_ref


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


def test_model_forward_golden():
    """Fixed-seed tiny flagship forward: output statistics snapshot.

    If this fails after an intentional change to init laws or layer
    structure, re-record the constants (they were produced by this exact
    code at the commit introducing the test).
    """
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    x = jnp.linspace(0, 1, 1 * 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
    params = model.init({"params": jax.random.PRNGKey(1234)}, x)
    outs = model.apply(params, x)
    stats = np.asarray(
        [[float(o.mean()), float(o.std())] for o in outs], dtype=np.float64
    )
    # recorded snapshot (CPU fp32, jax 0.8.x)
    want = np.asarray(RECORDED, dtype=np.float64)
    np.testing.assert_allclose(stats, want, rtol=2e-3, atol=2e-4)


# recorded on CPU fp32 (jax 0.8.x) at the commit introducing this test
RECORDED = [
    [0.4779943823814392, 0.5417346954345703],
    [0.46152573823928833, 0.44449782371520996],
    [0.5701711177825928, 0.47630253434181213],
]
