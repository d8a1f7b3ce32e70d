"""Train/data/eval subsystem tests: torch-CPU parity for the numerics the
reference delegates to torch (bilinear resize, adaptive pooling, reflect pad,
SSIM), schedule semantics, loss behavior, data pairing rule, and a smoke
overfit run of the jitted train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focalnet_tpu.configs import TrainConfig
from focalnet_tpu.evaluation.metrics import (
    adaptive_avg_pool,
    eval_ssim,
    pad_to_multiple,
    psnr_mse,
    ssim,
)
from focalnet_tpu.train.losses import bilinear_down, fft_l1, multiscale_loss
from focalnet_tpu.train.schedule import warmup_cosine_epoch_lr


# ---------------------------------------------------------------- losses

@pytest.mark.parametrize("factor", [2, 4])
def test_bilinear_down_matches_torch(factor):
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(2, 16, 24, 3).astype(np.float32)
    got = np.asarray(bilinear_down(jnp.asarray(x), factor))
    t = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        scale_factor=1.0 / factor, mode="bilinear",
    )
    want = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fft_l1_matches_torch():
    import torch

    a = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
    got = float(fft_l1(jnp.asarray(a), jnp.asarray(b)))
    # reference formula: L1 on stacked (real, imag) of fft2 (train.py:65-86)
    ta = torch.fft.fft2(torch.from_numpy(a.transpose(0, 3, 1, 2)), dim=(-2, -1))
    tb = torch.fft.fft2(torch.from_numpy(b.transpose(0, 3, 1, 2)), dim=(-2, -1))
    sa = torch.stack((ta.real, ta.imag), -1)
    sb = torch.stack((tb.real, tb.imag), -1)
    want = float(torch.nn.L1Loss()(sa, sb))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multiscale_loss_perfect_pred_is_zero():
    label = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    preds = [bilinear_down(label, 4), bilinear_down(label, 2), label]
    total, content, fft = multiscale_loss(preds, label)
    assert float(total) < 1e-5 and float(content) < 1e-6


# ---------------------------------------------------------------- schedule

def test_schedule_warmup_and_cosine():
    import torch

    base, n_epoch, warm, eta = 1e-4, 300, 3, 1e-6
    # warmup: epoch e trains at base * e / 3 (scheduler stepped once pre-loop)
    for e in (1, 2, 3):
        np.testing.assert_allclose(
            float(warmup_cosine_epoch_lr(e, base, n_epoch, warm, eta)),
            base * e / warm, rtol=1e-6,
        )
    # epoch 4 = cosine restart at t=0 => full base lr (the handoff off-by-one)
    np.testing.assert_allclose(
        float(warmup_cosine_epoch_lr(4, base, n_epoch, warm, eta)), base, rtol=1e-6
    )
    # cosine tail matches torch CosineAnnealingLR stepped e-4 times
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=n_epoch - warm, eta_min=eta
    )
    for e in range(4, n_epoch + 1):
        want = opt.param_groups[0]["lr"]
        got = float(warmup_cosine_epoch_lr(e, base, n_epoch, warm, eta))
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=f"epoch {e}")
        cos.step()


# ---------------------------------------------------------------- metrics

def test_pad_to_multiple_matches_torch_reflect():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(1, 460, 620, 3).astype(np.float32)
    got, (h, w) = pad_to_multiple(x, 32)
    assert (h, w) == (460, 620) and got.shape == (1, 480, 640, 3)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.pad(t, (0, 640 - 620, 0, 480 - 460), "reflect")
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1))


def test_adaptive_avg_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(2, 37, 53, 3).astype(np.float32)
    got = adaptive_avg_pool(x, 17, 23)
    t = F.adaptive_avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), (17, 23))
    np.testing.assert_allclose(got, t.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


def test_ssim_identity_and_torch_parity():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    x = rs.rand(1, 64, 64, 3).astype(np.float32)
    y = np.clip(x + 0.05 * rs.randn(1, 64, 64, 3).astype(np.float32), 0, 1)
    assert abs(float(ssim(x, x)[0]) - 1.0) < 1e-6

    # independent torch implementation of the pytorch_msssim algorithm:
    # separable gaussian (11, 1.5), valid conv, per-channel, mean over map
    def torch_ssim(a, b):
        a = torch.from_numpy(a.transpose(0, 3, 1, 2)).double()
        b = torch.from_numpy(b.transpose(0, 3, 1, 2)).double()
        coords = torch.arange(11, dtype=torch.float64) - 5
        g = torch.exp(-(coords**2) / (2 * 1.5**2)); g /= g.sum()
        win = (g[:, None] @ g[None, :]).expand(a.shape[1], 1, 11, 11)
        mu_a = F.conv2d(a, win, groups=a.shape[1])
        mu_b = F.conv2d(b, win, groups=a.shape[1])
        saa = F.conv2d(a * a, win, groups=a.shape[1]) - mu_a**2
        sbb = F.conv2d(b * b, win, groups=a.shape[1]) - mu_b**2
        sab = F.conv2d(a * b, win, groups=a.shape[1]) - mu_a * mu_b
        C1, C2 = 0.01**2, 0.03**2
        m = ((2 * mu_a * mu_b + C1) / (mu_a**2 + mu_b**2 + C1)) * (
            (2 * sab + C2) / (saa + sbb + C2))
        return float(m.mean())

    np.testing.assert_allclose(float(ssim(x, y)[0]), torch_ssim(x, y), rtol=1e-5)


def test_eval_ssim_down_ratio():
    # padded dims 480x640 -> down_ratio 2 -> pooled to 240x320
    x = np.random.RandomState(0).rand(1, 460, 620, 3).astype(np.float32)
    v = eval_ssim(x, x, (480, 640))
    assert abs(float(v[0]) - 1.0) < 1e-6


def test_adaptive_avg_pool_upsamples_like_torch():
    # the aligned-dims SSIM quirk pools a 256² image onto a 288² grid —
    # adaptive pooling with out > in duplicates pixels; match torch exactly
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(3).rand(1, 256, 256, 3).astype(np.float32)
    got = adaptive_avg_pool(x, 288, 288)
    t = F.adaptive_avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), (288, 288))
    np.testing.assert_allclose(got, t.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


def test_eval_ssim_aligned_dims_use_next_multiple():
    """Reference ``eval.py:34`` computes H = ((h+32)//32)*32 even when
    h % 32 == 0, so a /32-aligned 256² image uses H = W = 288 for the SSIM
    down_ratio/pool grid.  The evaluator must pass the formula dims, and the
    result must differ from pooling on the true dims (the round-1 bug)."""
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(4)
    x = rs.rand(1, 256, 256, 3).astype(np.float32)
    y = np.clip(x + 0.1 * rs.randn(1, 256, 256, 3).astype(np.float32), 0, 1)

    h = w = 256
    H = (h + 32) // 32 * 32
    assert (H, H) == (288, 288)
    got = float(eval_ssim(x, y, (H, H))[0])

    # torch emulation of the reference's exact pipeline at these dims
    def ref_ssim(a, b, H, W):
        down = max(1, round(min(H, W) / 256))
        ta = F.adaptive_avg_pool2d(
            torch.from_numpy(a.transpose(0, 3, 1, 2)).double(),
            (int(H / down), int(W / down)))
        tb = F.adaptive_avg_pool2d(
            torch.from_numpy(b.transpose(0, 3, 1, 2)).double(),
            (int(H / down), int(W / down)))
        return float(ssim(
            ta.numpy().transpose(0, 2, 3, 1), tb.numpy().transpose(0, 2, 3, 1)
        )[0])

    np.testing.assert_allclose(got, ref_ssim(x, y, H, H), rtol=1e-5)
    assert got != float(eval_ssim(x, y, (h, w))[0])


def test_psnr():
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = np.full((1, 8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(psnr_mse(x, y), 20.0, rtol=1e-5)


# ---------------------------------------------------------------- data

def test_reside_pairing_and_loaders(tmp_path):
    from focalnet_tpu.data import EvalLoader, ResideDataset, TrainLoader, make_synthetic_dataset

    root = make_synthetic_dataset(str(tmp_path), n_train=6, n_test=2, hw=(64, 80))
    ds = ResideDataset(os.path.join(root, "train"))
    assert ds.gt_name("8_1_0.9.png") == "8.png"
    hazy, gt, name = ds.load_pair(0)
    assert hazy.shape == (64, 80, 3) and gt.shape == (64, 80, 3)
    assert hazy.max() <= 1.0 and hazy.min() >= 0.0

    loader = TrainLoader(root, batch_size=2, num_workers=2, crop=32, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == len(loader)
    for h, g in batches:
        assert h.shape == (2, 32, 32, 3) and g.shape == (2, 32, 32, 3)

    ev = EvalLoader(root, "test")
    items = list(ev)
    assert len(items) == len(ev)
    h, g, name = items[0]
    assert h.shape == (1, 64, 80, 3) and name.endswith(".png")


def test_non_image_file_rejected(tmp_path):
    from focalnet_tpu.data import ResideDataset

    os.makedirs(tmp_path / "hazy")
    os.makedirs(tmp_path / "gt")
    (tmp_path / "hazy" / "bad.txt").write_text("x")
    with pytest.raises(ValueError):
        ResideDataset(str(tmp_path))


# ---------------------------------------------------------------- train step

def test_train_step_overfits_tiny():
    """A few steps on one batch must reduce the loss (clip 0.001 makes steps
    tiny, so use a larger clip for the smoke test of the machinery)."""
    import optax

    from focalnet_tpu.models import build_net
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16, ssm_d_state=4)
    cfg = TrainConfig(grad_clip=1.0, learning_rate=1e-3)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (2, 32, 32, 3))
    gt = jnp.clip(hazy * 1.2 - 0.05, 0, 1)
    params = model.init({"params": rng}, hazy)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, fft_weight=0.1)

    losses = []
    for i in range(5):
        params, opt_state, m = step(params, opt_state, hazy, gt, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_clip_applied():
    """With the reference clip of 0.001 the global update norm per step is
    bounded by ~lr * sqrt(n_params) regardless of raw gradient scale."""
    import optax

    from focalnet_tpu.train.trainer import make_optimizer

    cfg = TrainConfig(grad_clip=0.001, learning_rate=1e-4)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    huge_grads = {"w": jnp.full((4,), 1e6)}
    updates, _ = tx.update(huge_grads, opt_state, params)
    # after clipping, grad norm is 0.001 -> adam normalizes to ~lr steps
    assert float(jnp.max(jnp.abs(updates["w"]))) <= cfg.learning_rate * 1.01


def test_set_lr_locates_injected_state_structurally():
    """set_lr must find the inject_hyperparams slot by structure (not a
    hard-coded chain index) so chain reordering fails loudly, not silently."""
    import optax

    from focalnet_tpu.train.trainer import make_optimizer, set_lr

    cfg = TrainConfig(grad_clip=0.001, learning_rate=1e-4)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)

    opt_state = set_lr(opt_state, 3e-5)
    slots = [s for s in opt_state if hasattr(s, "hyperparams")]
    assert len(slots) == 1
    assert float(slots[0].hyperparams["learning_rate"]) == pytest.approx(3e-5)

    # reordered chain: still found
    opt_state_rev = tuple(reversed(opt_state))
    opt_state_rev = set_lr(opt_state_rev, 7e-5)
    slots = [s for s in opt_state_rev if hasattr(s, "hyperparams")]
    assert float(slots[0].hyperparams["learning_rate"]) == pytest.approx(7e-5)

    # no injected LR at all: loud failure
    plain = optax.adam(1e-4)
    with pytest.raises(ValueError):
        set_lr(plain.init(params), 1e-5)


def test_evaluate_rectangular_images(tmp_path):
    """SOTS-indoor images are 620x460 — eval must handle non-square, non-/32
    shapes through pad/crop."""
    from focalnet_tpu.data import make_synthetic_dataset
    from focalnet_tpu.evaluation import evaluate
    from focalnet_tpu.models import build_net

    data = make_synthetic_dataset(str(tmp_path), n_train=2, n_test=1, hw=(46, 62))
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16, ssm_d_state=4)
    import jax
    import jax.numpy as jnp

    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    out = evaluate(model, params, data)
    assert np.isfinite(out["psnr"]) and 0 < out["ssim"] <= 1


def test_validate_batched_matches_batch1(tmp_path):
    """The opt-in batched validation (valid_batch > 1) returns the same mean
    PSNR as the reference's batch-1 protocol, including with a mixed-size
    test set (shape buckets flush on change)."""
    from focalnet_tpu.data import make_synthetic_dataset
    from focalnet_tpu.evaluation import validate
    from focalnet_tpu.models import build_net

    import shutil

    root = make_synthetic_dataset(str(tmp_path / "a"), n_train=2, n_test=3,
                                  hw=(46, 62))
    # a second size merged into the same test split under non-colliding names
    other = make_synthetic_dataset(str(tmp_path / "b"), n_train=0, n_test=2,
                                   hw=(32, 32), seed=9)
    for sub in ("gt", "hazy"):
        src = os.path.join(other, "test", sub)
        dst = os.path.join(root, "test", sub)
        for f in os.listdir(src):
            shutil.copy(os.path.join(src, f), os.path.join(dst, "z" + f))
    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4)
    import jax
    import jax.numpy as jnp

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3)))
    ref = validate(model, params, root)
    for bs in (2, 8):
        got = validate(model, params, root, batch_size=bs)
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_grad_accum_matches_full_batch():
    """grad_accum over batch 4 produces the same update as the plain
    full-batch step (the loss is a per-sample mean, so equal micro means
    average to the exact gradient; drop_path disabled so both paths are
    deterministic).  SGD makes the update LINEAR in the gradient — under
    Adam the first step is ~lr*sign(g), which amplifies fp-reorder noise
    on near-zero components into +-lr flips and can't be compared."""
    import optax

    from focalnet_tpu.models import build_net
    from focalnet_tpu.train import make_train_step

    model = build_net("1mlp_g2", scan_backend="chunked", vssg_dim=16,
                      ssm_d_state=4, drop_path_rate=0.0)
    rng = jax.random.PRNGKey(0)
    hazy = jax.random.uniform(rng, (4, 32, 32, 3))
    gt = jnp.clip(hazy * 1.2 - 0.05, 0, 1)
    params = model.init({"params": rng}, hazy)

    out = {}
    for accum in (1, 2, 4):
        tx = optax.sgd(1.0)  # update == -gradient
        step = make_train_step(model, tx, fft_weight=0.1, grad_accum=accum)
        p, _, m = step(jax.tree_util.tree_map(jnp.copy, params),
                       tx.init(params), hazy, gt, rng)
        out[accum] = (p, m)

    p1, m1 = out[1]
    for accum in (2, 4):
        pa, ma = out[accum]
        for k in ("loss", "content", "fft"):
            np.testing.assert_allclose(float(ma[k]), float(m1[k]),
                                       rtol=2e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pa)):
            # params changed by exactly -grad; grads agree to fp reorder
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
