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


def test_seq_sharded_scan_pallas_backend():
    """The seq-sharded scan running the PALLAS kernel per shard (interpret
    mode on CPU) — proves the kernel-backed segment path composes with the
    prefix exchange, forward and reverse, values AND grads."""
    mesh = make_mesh(axes=("seq",))
    batch, dim, N, L = 1, 4, 4, 2048  # L_local = 256: two 128-lane chunks
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, 1, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, 1, N, L)) * 0.5

    for reverse in (False, True):
        def f(u, d, be):
            y = selective_scan_seq_sharded(
                u, d, A, B, C, mesh=mesh, backend=be, reverse=reverse
            )
            return jnp.sum(jnp.sin(y))

        vp, gp = jax.value_and_grad(
            lambda u, d: f(u, d, "pallas"), argnums=(0, 1)
        )(u, delta)
        vr, gr = jax.value_and_grad(
            lambda u, d: f(u, d, "ref"), argnums=(0, 1)
        )(u, delta)
        np.testing.assert_allclose(float(vp), float(vr), rtol=1e-5)
        for name, a, b in zip(("du", "ddelta"), gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"reverse={reverse} {name}",
            )


def test_seq_sharded_scan_pre_interleaved():
    """pre_interleaved operands (the model's fused-layout contract) through
    the seq-sharded path: interleave with the LOCAL chunk size, shard, scan."""
    from focalnet_tpu.ops.pallas_scan import interleave, deinterleave
    from focalnet_tpu.ops.selective_scan import scan_chunk_for

    mesh = make_mesh(axes=("seq",))
    batch, dim, N, L = 1, 4, 2, 2048
    Lloc = L // 8
    T = scan_chunk_for(Lloc, 2048)
    assert Lloc % T == 0
    ks = jax.random.split(jax.random.PRNGKey(13), 5)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, 1, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, 1, N, L)) * 0.5

    i = lambda x: interleave(x, T)
    for reverse in (False, True):
        y_i = selective_scan_seq_sharded(
            i(u), i(delta), A, i(B), i(C), mesh=mesh,
            pre_interleaved=True, reverse=reverse,
        )
        ref = selective_scan_ref(
            *( (jnp.flip(u, -1), jnp.flip(delta, -1), A,
                jnp.flip(B, -1), jnp.flip(C, -1)) if reverse
               else (u, delta, A, B, C) )
        )
        if reverse:
            ref = jnp.flip(ref, -1)
        np.testing.assert_allclose(
            np.asarray(deinterleave(y_i, T)), np.asarray(ref),
            rtol=1e-4, atol=1e-5, err_msg=f"reverse={reverse}",
        )


def test_ss2d_seq_parity_model_level():
    """SS2D with seq_axis sharding == plain SS2D, same params: the
    model-integrated sequence-parallel gate (VERDICT r2 item 1)."""
    from focalnet_tpu.models.ss2d import SS2D

    mesh = make_mesh(axes=("seq",))
    H = W = 32  # L = 1024, L_local = 128
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, 16)) * 0.5

    plain = SS2D(d_model=16, d_state=4, scan_backend="chunked")
    seq = SS2D(d_model=16, d_state=4, scan_backend="chunked",
               seq_mesh=mesh, seq_axis="seq")
    params = plain.init({"params": jax.random.PRNGKey(0)}, x)

    y1 = plain.apply(params, x)
    y8 = jax.jit(lambda p, x: seq.apply(p, x))(params, x)
    np.testing.assert_allclose(
        np.asarray(y8), np.asarray(y1), rtol=1e-4, atol=1e-5
    )

    # gradients w.r.t. params must match too (the training path)
    def loss(mod):
        return lambda p: jnp.sum(jnp.abs(mod.apply(p, x)))

    g1 = jax.grad(loss(plain))(params)
    g8 = jax.jit(jax.grad(loss(seq)))(params)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5 * scale,
            err_msg=str(ka),
        )


def test_full_model_dp_sp_train_step():
    """FULL MIMOUNet training step on a dp x sp (2 x 4) mesh: batch on
    ``data``, every SS2D scan length on ``seq``.  One step must run, produce
    finite loss, and match the single-device step's loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from focalnet_tpu.configs import TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import replicate
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer

    mesh = make_mesh((2, 4), ("data", "seq"))
    kw = dict(vssg_dim=16, ssm_d_state=4, scan_backend="chunked",
              drop_path_rate=0.0)
    model1 = build_net("1mlp_g2", **kw)
    model8 = build_net("1mlp_g2", seq_mesh=mesh, seq_axis="seq",
                       data_axis="data", **kw)
    cfg = TrainConfig(grad_clip=1.0, learning_rate=1e-3)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (2, 32, 32, 3))
    gt = jnp.clip(hazy * 1.1 - 0.02, 0, 1)
    # each step gets its OWN init copy: train_step donates its params/
    # opt_state buffers, and device_put may alias the source shard, so a
    # replicated view must not share buffers with a donated copy.  init is
    # deterministic — both copies are bit-identical.
    params = model1.init({"params": rng}, hazy[:1])
    opt_state = tx.init(params)
    step1 = make_train_step(model1, tx, 0.1)
    p1, o1, m1 = step1(params, opt_state, hazy, gt, rng)

    params2 = model1.init({"params": rng}, hazy[:1])
    params_r = replicate(params2, mesh)
    opt_r = replicate(tx.init(params2), mesh)
    sh = NamedSharding(mesh, P("data", "seq"))
    hazy_s = jax.device_put(hazy, sh)
    gt_s = jax.device_put(gt, sh)
    step8 = make_train_step(model8, tx, 0.1)
    p8, o8, m8 = step8(params_r, opt_r, hazy_s, gt_s, rng)
    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(p8))

    # gradients agree against the GLOBAL gradient scale (post-Adam params
    # would be sign-sensitive for near-zero grads — see the DP test note)
    from focalnet_tpu.train.losses import multiscale_loss

    def grads(model, p, hazy, gt):
        def loss_fn(p):
            return multiscale_loss(model.apply(p, hazy), gt, 0.1)[0]
        return jax.jit(jax.grad(loss_fn))(p)

    # re-init: step1/step8 donated the original params buffers
    params = model1.init({"params": rng}, hazy[:1])
    g1 = grads(model1, params, hazy, gt)
    g8 = grads(model8, replicate(params, mesh), hazy_s, gt_s)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4 * scale,
            err_msg=str(ka),
        )


def test_grad_accum_composes_with_data_parallel():
    """grad_accum under a sharded batch: the in-jit micro-batch scan runs on
    a DP mesh (XLA reshards the (accum, micro, ...) reshape over ICI) and
    matches the unsharded grad_accum step."""
    import optax

    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import replicate, shard_batch
    from focalnet_tpu.train import make_train_step

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4, drop_path_rate=0.0)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (8, 32, 32, 3))
    gt = jnp.clip(hazy * 1.1 - 0.02, 0, 1)
    params = model.init({"params": rng}, hazy[:1])

    tx = optax.sgd(1.0)  # update == -gradient (see test_train_eval.py)
    step = make_train_step(model, tx, fft_weight=0.1, grad_accum=2)

    p1, _, m1 = step(jax.tree_util.tree_map(jnp.copy, params),
                     tx.init(params), hazy, gt, rng)
    # params moved by exactly -grad (sgd 1.0); compute the GLOBAL gradient
    # scale now — on the CPU mesh device_put REUSES buffers, so replicate()
    # aliases `params` and the donated step below deletes them
    deltas1 = jax.tree_util.tree_map(lambda a, b: b - a, params, p1)
    global_scale = max(float(jnp.max(jnp.abs(x)))
                       for x in jax.tree.leaves(deltas1))

    mesh = make_mesh(axes=("data",))
    params_r = replicate(params, mesh)
    hazy_s, gt_s = shard_batch((hazy, gt), mesh)
    p8, _, m8 = step(params_r, tx.init(params), hazy_s, gt_s, rng)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    # judge agreement against the global gradient scale — true-zero-grad
    # leaves (e.g. conv bias into InstanceNorm) carry only reduction-order
    # cancellation noise (same rationale as
    # test_data_parallel_train_step_matches_single_device); slightly wider
    # atol than the plain DP test — the micro-batch scan adds one more
    # summation reorder on top of the psum
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1),
        jax.tree_util.tree_leaves_with_path(p8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a),
            rtol=2e-3, atol=2e-4 * global_scale, err_msg=str(ka),
        )


def test_tp_subgroup_sharded_scan_parity():
    """Sub-group TP (G=2 < 8 devices, the live model's case): the per-group
    channel block D_per is sharded and B/C are replicated — values AND input
    grads must match the oracle (the replicated-operand cotangents exercise
    shard_map's psum insertion)."""
    from focalnet_tpu.parallel import selective_scan_tp

    mesh = make_mesh(axes=("model",))
    batch, G, N, L = 2, 2, 4, 128
    D_per = 16  # % 8 == 0
    dim = G * D_per
    ks = jax.random.split(jax.random.PRNGKey(17), 7)
    u = jax.random.normal(ks[0], (batch, dim, L)) * 0.5
    delta = 0.5 * jax.random.uniform(ks[1], (batch, dim, L))
    A = -1.0 - jax.random.uniform(ks[2], (dim, N))
    B = jax.random.normal(ks[3], (batch, G, N, L)) * 0.5
    C = jax.random.normal(ks[4], (batch, G, N, L)) * 0.5
    D = jax.random.normal(ks[5], (dim,))
    bias = 0.3 * jax.random.normal(ks[6], (dim,))

    def f(scan):
        return lambda u, d, B, C: jnp.sum(
            jnp.sin(scan(u, d, B, C)))

    tp = jax.jit(f(lambda u, d, B, C: selective_scan_tp(
        u, d, A, B, C, D, bias, True, mesh=mesh)))
    ref = f(lambda u, d, B, C: selective_scan_ref(
        u, d, A, B, C, D, bias, True))

    np.testing.assert_allclose(
        float(tp(u, delta, B, C)), float(ref(u, delta, B, C)), rtol=1e-5
    )
    g_t = jax.jit(jax.grad(tp, argnums=(0, 1, 2, 3)))(u, delta, B, C)
    g_r = jax.grad(ref, argnums=(0, 1, 2, 3))(u, delta, B, C)
    for name, a, b in zip(("du", "ddelta", "dB", "dC"), g_t, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_ss2d_tp_parity_model_level():
    """SS2D with tp_axis sharding == plain SS2D, same params (values + param
    grads): the model-integrated tensor-parallel gate (VERDICT r3 item 4)."""
    from focalnet_tpu.models.ss2d import SS2D

    mesh = make_mesh(axes=("model",))
    H = W = 16
    x = jax.random.normal(jax.random.PRNGKey(19), (2, H, W, 16)) * 0.5

    # d_model 16 -> d_inner 32: each direction-pair scan call is dim=64,
    # G=2 groups of D_per=32 (% 8 == 0) -> the sub-group sharding path
    plain = SS2D(d_model=16, d_state=4, scan_backend="chunked")
    tp = SS2D(d_model=16, d_state=4, scan_backend="chunked",
              seq_mesh=mesh, tp_axis="model")
    params = plain.init({"params": jax.random.PRNGKey(0)}, x)

    y1 = plain.apply(params, x)
    y8 = jax.jit(lambda p, x: tp.apply(p, x))(params, x)
    np.testing.assert_allclose(
        np.asarray(y8), np.asarray(y1), rtol=1e-4, atol=1e-5
    )

    def loss(mod):
        return lambda p: jnp.sum(jnp.abs(mod.apply(p, x)))

    g1 = jax.grad(loss(plain))(params)
    g8 = jax.jit(jax.grad(loss(tp)))(params)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5 * scale,
            err_msg=str(ka),
        )


def test_full_model_dp_tp_train_step():
    """FULL MIMOUNet training step on a dp x tp (2 x 4) mesh: batch on
    ``data``, every SS2D's scan channels on ``model`` — loss and gradients
    must match the single-device step (completes the §2.3 TP row at model
    level alongside the dp x sp test above)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from focalnet_tpu.configs import TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import replicate
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.losses import multiscale_loss
    from focalnet_tpu.train.trainer import make_optimizer

    mesh = make_mesh((2, 4), ("data", "model"))
    # vssg_dim 16 -> d_inner 32 = D_per; % 4 == 0 for the tp axis
    kw = dict(vssg_dim=16, ssm_d_state=4, scan_backend="chunked",
              drop_path_rate=0.0)
    model1 = build_net("1mlp_g2", **kw)
    model8 = build_net("1mlp_g2", seq_mesh=mesh, tp_axis="model",
                       data_axis="data", **kw)
    tx = make_optimizer(TrainConfig(grad_clip=1.0, learning_rate=1e-3))
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (2, 32, 32, 3))
    gt = jnp.clip(hazy * 1.1 - 0.02, 0, 1)
    params = model1.init({"params": rng}, hazy[:1])
    step1 = make_train_step(model1, tx, 0.1)
    p1, o1, m1 = step1(params, tx.init(params), hazy, gt, rng)

    params2 = model1.init({"params": rng}, hazy[:1])
    params_r = replicate(params2, mesh)
    sh = NamedSharding(mesh, P("data"))
    hazy_s, gt_s = jax.device_put(hazy, sh), jax.device_put(gt, sh)
    step8 = make_train_step(model8, tx, 0.1)
    p8, o8, m8 = step8(params_r, replicate(tx.init(params2), mesh),
                       hazy_s, gt_s, rng)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(p8))

    def grads(model, p, hazy, gt):
        def loss_fn(p):
            return multiscale_loss(model.apply(p, hazy), gt, 0.1)[0]
        return jax.jit(jax.grad(loss_fn))(p)

    params = model1.init({"params": rng}, hazy[:1])
    g1 = grads(model1, params, hazy, gt)
    g8 = grads(model8, replicate(params, mesh), hazy_s, gt_s)
    scale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g1))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4 * scale,
            err_msg=str(ka),
        )


def test_seq_scan_grad_memory_streams_pterm():
    """Compile-only proof that the seq-sharded scan's prefix correction does
    NOT materialize its (batch, dim, N, L_local) Pterm under jax.grad
    (VERDICT r3 weak #2): XLA's producer-consumer fusion re-derives the exp
    chain inside each backward consumer.  Also pins that the jax.checkpoint
    alternative is WORSE (it materializes the recomputed intermediates) —
    the reason seq_scan._CHECKPOINT_CORR defaults to False.

    Shape: one fwd + one reverse seq-sharded call (an SS2D core's per-pair
    structure) at batch=2, dim=192, N=16, L=16384 over 8 devices ->
    Pterm = 50.3 MB per call per device, 100.6 MB if both residuals lived.
    Measured (this harness, pallas-interpret): 145.0 MB plain vs 190.6 MB
    checkpointed; the ceiling below trips if even one Pterm pair starts
    getting buffers."""
    from focalnet_tpu.parallel import seq_scan

    mesh = make_mesh(axes=("seq",))
    batch, dim, N, L, G = 2, 192, 16, 16384, 2
    u = jnp.zeros((batch, dim, L))
    delta = jnp.zeros((batch, dim, L))
    A = -1.0 - jnp.zeros((dim, N))
    B = jnp.zeros((batch, G, N, L))
    C = jnp.zeros((batch, G, N, L))
    pterm = batch * dim * N * (L // 8) * 4  # bytes/device/call

    def temp_bytes(flag):
        old = seq_scan._CHECKPOINT_CORR
        seq_scan._CHECKPOINT_CORR = flag
        try:
            def loss(u, d):
                kw = dict(mesh=mesh, backend="pallas", delta_softplus=True)
                y = selective_scan_seq_sharded(u, d, A, B, C, **kw)
                y = y + selective_scan_seq_sharded(
                    u, d, A, B, C, reverse=True, **kw)
                return jnp.sum(y)

            c = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(u, delta).compile()
            return c.memory_analysis().temp_size_in_bytes
        finally:
            seq_scan._CHECKPOINT_CORR = old

    plain = temp_bytes(False)
    ckpt = temp_bytes(True)
    # the production default is never worse than the checkpointed form
    assert plain <= ckpt + 5_000_000, (plain, ckpt)
    # absolute ceiling: measured 145 MB; 2 materialized Pterms would add
    # ~100 MB on top of the same base and trip this
    assert plain < int(1.35 * (145_000_000)), plain


def test_multihost_data_parallel_train_step():
    """TWO real jax.distributed processes (4 virtual CPU devices each, Gloo
    collectives) run ``make_global_batch`` + one DP train step on halves of
    the same global batch; their loss must match the single-process step on
    the full batch — converting ``parallel/mesh.py``'s multi-host branch
    from 'untested' to covered (VERDICT r3 missing #4)."""
    import os
    import socket
    import subprocess
    import sys

    import numpy as np

    from focalnet_tpu.configs import TrainConfig
    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import make_global_batch
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer

    # single-process reference on this process's own 8-device mesh
    model = build_net("1mlp_g2", vssg_dim=16, ssm_d_state=4,
                      scan_backend="chunked", drop_path_rate=0.0)
    tx = make_optimizer(TrainConfig(grad_clip=1.0, learning_rate=1e-3))
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    hazy = rs.uniform(size=(8, 16, 16, 3)).astype(np.float32)
    gt = np.clip(hazy * 1.1 - 0.02, 0.0, 1.0).astype(np.float32)
    params = model.init({"params": rng}, hazy[:1])
    mesh = make_mesh(axes=("data",))
    hazy_g, gt_g = make_global_batch((hazy, gt), mesh)
    step = make_train_step(model, tx, fft_weight=0.1)
    _, _, m1 = step(params, tx.init(params), hazy_g, gt_g, rng)
    ref_loss = float(m1["loss"])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(here),
                    env.get("PYTHONPATH", "")] if p
    )
    worker = os.path.join(here, "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MHLOSS ")]
        assert lines, out[-3000:]
        losses.append(float(lines[-1].split()[1]))
    for loss in losses:
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
