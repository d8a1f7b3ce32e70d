"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py):
sequence-sharded scan parity vs the single-device oracle, and data-parallel
train-step equivalence — coverage the reference never had (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalnet_tpu.ops.scan_ref import selective_scan_ref
from focalnet_tpu.parallel import make_mesh, selective_scan_seq_sharded


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """Compile this module without the persistent cache: serializing the
    donated 8-device train-step executable ABORTS inside XLA:CPU's AOT
    serializer when it happens late in a long pytest process (reproducible
    at test_data_parallel_train_step_matches_single_device after ~40 other
    tests; the same executable serializes fine in a fresh process).  The
    cache write is the only casualty — skip it for these few executables.
    (Neither clearing the dir nor jax_enable_compilation_cache takes effect
    mid-process — both are consulted through state memoized at first use.
    persistent_cache_min_compile_time_secs IS read dynamically immediately
    before each write, so an absurd threshold is the reliable off switch.)"""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_seq_sharded_scan_parity():
    """L sharded over 8 devices must match the sequential oracle."""
    mesh = make_mesh(axes=("seq",))
    batch, dim, N, L, G = 2, 8, 4, 512, 1
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -0.5 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, G, N, L)) * 0.5
    D = jax.random.normal(ks[5], (dim,))
    bias = 0.3 * jax.random.normal(ks[6], (dim,))

    ref = selective_scan_ref(u, delta, A, B, C, D, bias, True)
    got = selective_scan_seq_sharded(
        u, delta, A, B, C, D, bias, True, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_seq_sharded_scan_jit():
    """Same, under jit (the production path)."""
    mesh = make_mesh(axes=("seq",))
    batch, dim, N, L = 1, 4, 2, 256
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, 1, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, 1, N, L)) * 0.5

    f = jax.jit(lambda u, d: selective_scan_seq_sharded(u, d, A, B, C, mesh=mesh))
    got = f(u, delta)
    ref = selective_scan_ref(u, delta, A, B, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_data_parallel_train_step_matches_single_device():
    """DP over 8 devices produces the same update as single-device training
    (same global batch) — the gradient psum correctness gate."""
    from focalnet_tpu.configs import TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import replicate, shard_batch
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    cfg = TrainConfig(grad_clip=1.0, learning_rate=1e-3)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (8, 32, 32, 3))
    gt = jnp.clip(hazy * 1.1 - 0.02, 0, 1)
    params = model.init({"params": rng}, hazy[:1])
    opt_state = tx.init(params)

    from focalnet_tpu.train.losses import multiscale_loss

    @jax.jit
    def loss_and_grad(p, hazy, gt):
        def loss_fn(p):
            preds = model.apply(p, hazy)
            return multiscale_loss(preds, gt, 0.1)[0]
        return jax.value_and_grad(loss_fn)(p)

    # single device
    l1, g1 = loss_and_grad(params, hazy, gt)
    # sharded over the mesh: XLA inserts the gradient psum over "data"
    mesh = make_mesh(axes=("data",))
    params_r = replicate(params, mesh)
    hazy_s, gt_s = shard_batch((hazy, gt), mesh)
    l8, g8 = loss_and_grad(params_r, hazy_s, gt_s)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # gradients must agree up to reduction-order float noise, judged against
    # the GLOBAL gradient scale: leaves whose true gradient is exactly zero
    # (e.g. conv bias feeding InstanceNorm) carry only cancellation noise and
    # must not be compared relatively.  (Comparing post-Adam params instead
    # would be sign-sensitive for near-zero grads.)
    global_scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a),
            rtol=1e-3, atol=1e-4 * global_scale, err_msg=str(ka),
        )
    # one optimizer step still runs end-to-end on sharded inputs
    step = make_train_step(model, tx, fft_weight=0.1)
    opt_r = replicate(opt_state, mesh)
    p8, o8, m8 = step(params_r, opt_r, hazy_s, gt_s, rng)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(p8))


def test_tp_channel_sharded_scan_parity():
    """Channel (tensor-parallel) sharded scan == oracle; no collectives
    needed — the recurrence is independent per channel."""
    from focalnet_tpu.parallel import selective_scan_tp

    mesh = make_mesh(axes=("model",))
    batch, G, N, L = 2, 8, 4, 128  # 8 groups over 8 devices
    dim = 2 * G
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, G, N, L)) * 0.5
    D = jax.random.normal(ks[5], (dim,))
    bias = 0.3 * jax.random.normal(ks[6], (dim,))

    got = jax.jit(
        lambda u, d: selective_scan_tp(
            u, d, A, B, C, D, bias, True, mesh=mesh
        )
    )(u, delta)
    ref = selective_scan_ref(u, delta, A, B, C, D, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_two_axis_mesh_dp_sp_compose():
    """dp x sp on one 2x4 mesh: batch sharded over ``data`` while the scan's
    L is sharded over ``seq`` — values AND gradients must match the
    single-device oracle (the strongest multi-chip correctness statement
    available without hardware; VERDICT r1 item 10)."""
    mesh = make_mesh((2, 4), ("data", "seq"))
    batch, dim, N, L, G = 4, 8, 4, 256, 1
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, G, N, L)) * 0.5

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", None, "seq"))
    u_s = jax.device_put(u, sh)
    delta_s = jax.device_put(delta, sh)

    def loss(fn):
        return lambda u, d: jnp.sum(jnp.sin(fn(u, d)))

    sharded = jax.jit(loss(lambda u, d: selective_scan_seq_sharded(
        u, d, A, B, C, mesh=mesh, axis="seq", batch_axis="data")))
    oracle = loss(lambda u, d: selective_scan_ref(u, d, A, B, C))

    np.testing.assert_allclose(
        float(sharded(u_s, delta_s)), float(oracle(u, delta)), rtol=1e-5
    )
    g_s = jax.jit(jax.grad(sharded, argnums=(0, 1)))(u_s, delta_s)
    g_o = jax.grad(oracle, argnums=(0, 1))(u, delta)
    for name, a, b in zip(("du", "ddelta"), g_s, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_make_global_batch_single_process():
    """Single-process path == shard_batch (multi-host branch can't run here)."""
    from focalnet_tpu.parallel import make_global_batch, shard_batch

    mesh = make_mesh(axes=("data",))
    x = jnp.arange(8.0 * 4).reshape(8, 4)
    a = make_global_batch(x, mesh)
    b = shard_batch(x, mesh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
