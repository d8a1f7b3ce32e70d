"""Mixed-precision (compute_dtype=bfloat16) tests: params stay fp32, outputs
return fp32, values track the fp32 path within bf16 tolerance, grads finite."""

import jax
import jax.numpy as jnp
import numpy as np

from focalnet_tpu.models import build_net


def _tiny(compute_dtype):
    return build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                     ssm_d_state=4, compute_dtype=compute_dtype)


def test_bf16_dtypes_and_values():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    m32, mb = _tiny("float32"), _tiny("bfloat16")
    p = m32.init({"params": jax.random.PRNGKey(1)}, x)
    outs32 = m32.apply(p, x)
    outsb = mb.apply(p, x)  # same params work for both compute dtypes
    assert {str(q.dtype) for q in jax.tree.leaves(p)} == {"float32"}
    for a, b in zip(outs32, outsb):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.15)


def test_ssm_out_dtype_bf16_model():
    """`ssm_out_dtype=bfloat16` (bf16 scan OUTPUT, the opt-in HBM saver for
    the bf16 skeleton): outputs stay fp32 at the model boundary, track the
    fp32-out bf16 skeleton within bf16 tolerance; grads finite fp32."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    m_ref = _tiny("bfloat16")
    m_b = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                    ssm_d_state=4, compute_dtype="bfloat16",
                    ssm_out_dtype="bfloat16")
    p = m_ref.init({"params": jax.random.PRNGKey(1)}, x)
    outs_ref = m_ref.apply(p, x)
    outs_b = m_b.apply(p, x)
    for a, b in zip(outs_ref, outs_b):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.15)

    from focalnet_tpu.train.losses import multiscale_loss

    def loss(p):
        outs = m_b.apply(p, x)
        return multiscale_loss(outs, jnp.clip(x * 1.1, 0, 1))[0]

    g = jax.jit(jax.grad(loss))(p)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_bf16_grads_finite():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    mb = _tiny("bfloat16")
    p = mb.init({"params": jax.random.PRNGKey(1)}, x)

    from focalnet_tpu.train.losses import multiscale_loss

    def loss(p):
        outs = mb.apply(p, x)
        return multiscale_loss(outs, jnp.clip(x * 1.1, 0, 1))[0]

    g = jax.jit(jax.grad(loss))(p)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)  # fp32 master grads
