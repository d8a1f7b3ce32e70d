"""Model-stack tests: op parity vs torch-CPU, preset forwards, golden shapes.

The reference has no model tests (SURVEY.md §4); these add the coverage the
TPU build needs: layout-op parity against torch CPU (pixel shuffle, nearest
downsample, GELU), SS2D backend consistency, preset construction, and
gradient-flow checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalnet_tpu.configs import PRESETS
from focalnet_tpu.models import (
    SS2D,
    VSSG,
    BasicConv,
    MIMOUNet,
    VSSBlock,
    build_net,
    nearest_down2,
    pixel_shuffle,
)
from focalnet_tpu.ops.cross_scan import cross_merge, cross_scan


def test_pixel_shuffle_matches_torch():
    import torch

    B, H, W, C, r = 2, 3, 5, 4, 2
    x = np.random.RandomState(0).randn(B, H, W, C * r * r).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    # torch: NCHW
    t = torch.nn.PixelShuffle(r)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_nearest_down2_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(1).randn(2, 8, 6, 3).astype(np.float32)
    got = np.asarray(nearest_down2(jnp.asarray(x)))
    t = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=0.5)
    want = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gelu_exact_matches_torch():
    import torch

    from focalnet_tpu.models.layers import gelu_exact

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_cross_scan_merge_adjoint():
    """cross_merge(cross_scan(x)) == 4x (each direction is a permutation)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 3))
    ys = cross_scan(x)
    back = cross_merge(ys, 4, 6)
    np.testing.assert_allclose(np.asarray(back), 4 * np.asarray(x), rtol=1e-6)


def test_ss2d_shape_and_backend_consistency():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16)) * 0.5
    outs = {}
    for backend in ["chunked", "assoc"]:
        m = SS2D(d_model=16, d_state=4, scan_backend=backend)
        params = m.init({"params": jax.random.PRNGKey(1)}, x)
        outs[backend] = np.asarray(m.apply(params, x))
    assert outs["chunked"].shape == (1, 8, 8, 16)
    np.testing.assert_allclose(outs["chunked"], outs["assoc"], rtol=1e-4, atol=1e-5)


def test_ss2d_forward_type_tags():
    from focalnet_tpu.models import parse_forward_type

    f = parse_forward_type("v4")
    assert f["base"] == "v4" and not f["force_fp32"] and f["out_norm"] == "ln"
    f = parse_forward_type("v2")
    assert f["force_fp32"]
    f = parse_forward_type("v2no32")
    assert not f["force_fp32"]
    # v1 is force_fp32 UNCONDITIONALLY (vmamba_layers.py:450) — no32 is
    # honored only by v01/v2
    assert parse_forward_type("v1")["force_fp32"]
    assert parse_forward_type("v1no32")["force_fp32"]
    f = parse_forward_type("v4noz")
    assert f["disable_z"]
    f = parse_forward_type("v4softmax")
    assert f["out_norm"] == "softmax"
    # tag variants still build + run
    x = jnp.ones((1, 4, 4, 8)) * 0.1
    for ft in ["v4", "v4noz", "v4none", "v4sigmoid", "v2"]:
        m = SS2D(d_model=8, d_state=2, forward_type=ft, scan_backend="chunked")
        p = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(p, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_vssblock_residual():
    """mlp_ratio=0 disables the FFN branch; output stays finite and shaped."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16)) * 0.1
    for mlp_ratio in [0.0, 1.0]:
        m = VSSBlock(hidden_dim=16, ssm_d_state=4, mlp_ratio=mlp_ratio,
                     scan_backend="chunked")
        p = m.init({"params": jax.random.PRNGKey(1)}, x)
        y = m.apply(p, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_vssg_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8)) * 0.1
    for gl_merge, ps in [(False, 2), (True, 4)]:
        m = VSSG(in_chans=8, patch_size_global=ps, patch_size_local=2,
                 gl_merge=gl_merge, dim=16, ssm_d_state=4, mlp_ratio=1.0,
                 scan_backend="chunked")
        p = m.init({"params": jax.random.PRNGKey(1)}, x)
        y = m.apply(p, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("preset", list(PRESETS))
def test_presets_forward(preset):
    model = build_net(preset, scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    if PRESETS[preset].block_type == "resblock":
        model = build_net(preset, scan_backend="chunked", num_res=2)
    x = jnp.full((1, 32, 32, 3), 0.5)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    outs = model.apply(params, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 8, 3), (1, 16, 16, 3), (1, 32, 32, 3)
    ]
    for o in outs:
        assert bool(jnp.all(jnp.isfinite(o)))


def test_model_grad_flows():
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    x = jnp.full((1, 32, 32, 3), 0.5)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)

    @jax.jit
    def loss(p):
        outs = model.apply(p, x)
        return sum(jnp.mean(jnp.abs(o)) for o in outs)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(p))) for p in leaves)
    # every parameter receives gradient signal somewhere
    nonzero = sum(int(jnp.any(p != 0)) for p in leaves)
    assert nonzero > 0.9 * len(leaves)


def test_droppath_train_vs_eval():
    m = VSSBlock(hidden_dim=8, ssm_d_state=2, drop_path=0.9, mlp_ratio=1.0,
                 scan_backend="chunked")
    # random input: constant input would zero both pre-norm branches
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 8)) * 0.3
    p = m.init({"params": jax.random.PRNGKey(0)}, x)
    y_eval = m.apply(p, x, deterministic=True)
    y_train = m.apply(
        p, x, deterministic=False,
        rngs={"droppath": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert y_eval.shape == y_train.shape
    # with rate 0.9 the two must differ for some sample
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
