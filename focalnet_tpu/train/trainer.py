"""Training loop (``/root/reference/ITS/train.py:13-131``), TPU-native.

Recipe parity: Adam(lr 1e-4, betas 0.9/0.999, eps 1e-8), 3-epoch linear
warmup then cosine to 1e-6 with the GradualWarmupScheduler handoff semantics
(see :mod:`focalnet_tpu.train.schedule`), multiscale L1 + 0.1*FFT loss,
**global-norm clip 0.001 before the optimizer step** (``train.py:90``),
rolling/periodic/best/final checkpoints, stdout formats matching the
reference's log-scraper regexes.

TPU-native design: one jitted ``train_step`` (loss + grad + clip + update)
with the batch sharded over the ``data`` mesh axis — XLA inserts the gradient
all-reduce over ICI; params/opt-state are donated so the update is in-place
in HBM.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from focalnet_tpu.configs import ModelConfig, TrainConfig
from focalnet_tpu.data import TrainLoader
from focalnet_tpu.evaluation import validate
from focalnet_tpu.parallel import make_global_batch, make_mesh, replicate
from focalnet_tpu.train.checkpoint import CheckpointManager
from focalnet_tpu.train.losses import multiscale_loss
from focalnet_tpu.train.schedule import warmup_cosine_epoch_lr
from focalnet_tpu.utils import Adder, Timer


def make_optimizer(cfg: TrainConfig):
    """clip_by_global_norm(0.001) -> Adam, with the LR injected per step via
    ``optax.inject_hyperparams`` so the per-epoch schedule stays outside jit."""
    adam = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), adam)


def set_lr(opt_state, lr):
    """Write the epoch LR into the inject_hyperparams state.

    The state is located structurally (the unique chain element exposing a
    ``hyperparams['learning_rate']``) rather than by a hard-coded chain
    index, so reordering :func:`make_optimizer`'s chain cannot silently
    break LR scheduling."""
    slots = [
        s for s in opt_state
        if isinstance(getattr(s, "hyperparams", None), dict)
        and "learning_rate" in s.hyperparams
    ]
    if len(slots) != 1:
        raise ValueError(
            f"expected exactly one injected learning_rate in the optimizer "
            f"chain, found {len(slots)}"
        )
    slots[0].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def make_train_step(model, tx, fft_weight: float, grad_accum: int = 1):
    """One jitted step: loss + grad + clip + update.

    ``grad_accum > 1`` splits the global batch into that many equal
    micro-batches and accumulates gradients over a ``lax.scan`` before the
    single optimizer update — activation HBM scales with the micro-batch
    while the effective batch stays ``batch_size`` (the TPU substitute for
    the big-batch regime; the loss is a per-sample mean, so equal micro
    means average to the exact full-batch gradient, fp reorder aside).
    """

    def loss_fn(p, hazy, gt, rng):
        preds = model.apply(
            p, hazy, deterministic=False, train=False,
            rngs={"droppath": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        total, content, fft = multiscale_loss(preds, gt, fft_weight)
        return total, (content, fft)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, hazy, gt, rng):
        (loss, (content, fft)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, hazy, gt, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "content": content, "fft": fft}

    if grad_accum == 1:
        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step_accum(params, opt_state, hazy, gt, rng):
        b = hazy.shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch size {b} not divisible by grad_accum {grad_accum}")
        mb = b // grad_accum
        hz = hazy.reshape(grad_accum, mb, *hazy.shape[1:])
        gts = gt.reshape(grad_accum, mb, *gt.shape[1:])

        def body(acc, xs):
            g_acc, m_acc = acc
            h, g, i = xs
            (loss, (content, fft)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, h, g, jax.random.fold_in(rng, i))
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            m_acc = jax.tree_util.tree_map(
                jnp.add, m_acc, {"loss": loss, "content": content, "fft": fft})
            return (g_acc, m_acc), None

        zeros_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype, jnp.float32)),
            params)
        zeros_m = {k: jnp.zeros((), jnp.float32)
                   for k in ("loss", "content", "fft")}
        (g_sum, m_sum), _ = jax.lax.scan(
            body, (zeros_g, zeros_m),
            (hz, gts, jnp.arange(grad_accum)))
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
        metrics = {k: v * inv for k, v in m_sum.items()}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step_accum


def init_params(model, rng, crop: int, batch: int = 1):
    x = jnp.zeros((batch, crop, crop, 3))
    return jax.jit(model.init)({"params": rng}, x)


def auto_mesh_shape(batch_size: int):
    """Largest device count dividing the global batch, all on ``data`` —
    the default-DP shape for ``TrainConfig.mesh_shape=None``."""
    n = jax.device_count()
    while n > 1 and batch_size % n != 0:
        n -= 1
    return (n,)


def train(model, model_cfg: ModelConfig, cfg: TrainConfig,
          resume: Optional[str] = None, log_file: Optional[str] = None,
          eval_model=None):
    """Full training driver — the ``_train`` equivalent.

    ``eval_model``: a mesh-free twin of ``model`` (identical parameter tree)
    used for param init and batch-1 validation.  Required when ``model`` is
    sequence-parallel (dp×sp): its shard_map needs the batch divisible by the
    data-axis size, which batch-1 init/validation forwards violate.  Defaults
    to ``model`` itself.
    """
    if eval_model is None:
        eval_model = model
    shape = cfg.mesh_shape or auto_mesh_shape(cfg.batch_size)
    mesh = make_mesh(tuple(shape), tuple(cfg.mesh_axes))
    if mesh.size > 1:
        print("Mesh: %s over %d devices" % (dict(zip(cfg.mesh_axes, shape)), mesh.size))
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)

    params = init_params(eval_model, init_rng, cfg.crop_size)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    ckpt = CheckpointManager(cfg.model_save_dir)
    start_epoch = 1
    if resume:
        state = ckpt.restore("model", template={
            "params": params, "opt_state": opt_state, "epoch": 0,
        })
        params, opt_state = state["params"], state["opt_state"]
        print("Resume from %d" % state["epoch"])
        start_epoch = int(state["epoch"]) + 1

    loader = TrainLoader(
        cfg.data_dir, cfg.batch_size, cfg.num_worker,
        crop=cfg.crop_size, seed=cfg.seed,
    )
    max_iter = len(loader)
    train_step = make_train_step(model, tx, cfg.fft_loss_weight,
                                cfg.grad_accum)

    logf = open(log_file, "a") if log_file else None
    # structured metrics next to the text log (TensorBoard-scalar equivalent
    # of the reference's SummaryWriter Pixel/FFT/PSNR scalars, train.py:36,103)
    metricsf = (
        open(os.path.splitext(log_file)[0] + ".metrics.jsonl", "a")
        if log_file else None
    )
    # real TensorBoard events too, when the (torch-bundled) writer imports —
    # same tags as the reference (train.py:36,103-104,126)
    tb = None
    if log_file:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(os.path.join(cfg.model_save_dir, "runs"))
        except Exception:
            pass

    def log(msg):
        print(msg)
        if logf:
            logf.write(msg + "\n")
            logf.flush()

    def log_metric(**kv):
        if metricsf:
            metricsf.write(json.dumps(kv) + "\n")
            metricsf.flush()

    epoch_pixel, epoch_fft = Adder(), Adder()
    iter_pixel, iter_fft = Adder(), Adder()
    epoch_timer, iter_timer = Timer("m"), Timer("m")
    best_psnr = -1.0
    step_rng = jax.random.fold_in(rng, 7)

    for epoch_idx in range(start_epoch, cfg.num_epoch + 1):
        lr = float(warmup_cosine_epoch_lr(
            epoch_idx, cfg.learning_rate, cfg.num_epoch,
            cfg.warmup_epochs, cfg.lr_min,
        ))
        opt_state = set_lr(opt_state, lr)

        epoch_timer.tic()
        iter_timer.tic()
        # Steps dispatch asynchronously; the loss scalars stay on-device and
        # are pulled only at logging boundaries (print_freq / epoch end), so
        # the host free-runs ahead of the device like the reference's async
        # CUDA stream does (train.py:58-90) instead of paying one
        # device->host sync per step (~25 ms tunnel RTT here).
        pending = []

        def drain():
            if not pending:
                return
            # ONE batched device->host transfer for every buffered step —
            # per-scalar float() pulls would pay one ~25 ms tunnel RTT each
            for m in jax.device_get(pending):
                c, f = float(m["content"]), float(m["fft"])
                iter_pixel(c); iter_fft(f)
                epoch_pixel(c); epoch_fft(f)
            pending.clear()

        for iter_idx, (hazy, gt) in enumerate(loader.epoch()):
            hazy, gt = make_global_batch((hazy, gt), mesh)
            r = jax.random.fold_in(step_rng, epoch_idx * max_iter + iter_idx)
            params, opt_state, metrics = train_step(params, opt_state, hazy, gt, r)
            pending.append(metrics)

            if (iter_idx + 1) % cfg.print_freq == 0:
                drain()
                log("Time: %7.4f Epoch: %03d Iter: %4d/%4d LR: %.10f "
                    "Loss content: %7.4f Loss fft: %7.4f" % (
                        iter_timer.toc(), epoch_idx, iter_idx + 1, max_iter,
                        lr, iter_pixel.average(), iter_fft.average()))
                log_metric(
                    step=(epoch_idx - 1) * max_iter + iter_idx,
                    pixel_loss=iter_pixel.average(),
                    fft_loss=iter_fft.average(), lr=lr,
                )
                if tb:
                    # per-print_freq scalars on the reference's global-step
                    # x-axis (iter_idx + (epoch-1)*max_iter, train.py:103-104)
                    gs = iter_idx + (epoch_idx - 1) * max_iter
                    tb.add_scalar("Pixel Loss", iter_pixel.average(), gs)
                    tb.add_scalar("FFT Loss", iter_fft.average(), gs)
                iter_timer.tic()
                iter_pixel.reset(); iter_fft.reset()

        drain()
        ckpt.save_rolling(params, opt_state, epoch_idx)
        if epoch_idx % cfg.save_freq == 0:
            ckpt.save_snapshot(params, epoch_idx)
        log("EPOCH: %02d\nElapsed time: %4.2f Epoch Pixel Loss: %7.4f "
            "Epoch FFT Loss: %7.4f" % (
                epoch_idx, epoch_timer.toc(),
                epoch_pixel.average(), epoch_fft.average()))
        # (no per-epoch Pixel/FFT TB scalars: the reference writes those tags
        # only at print_freq on the global-step axis — mixing an epoch-indexed
        # point into the same tag would corrupt the x-axis)
        epoch_pixel.reset(); epoch_fft.reset()

        if epoch_idx % cfg.valid_freq == 0 or epoch_idx == 1:
            val = validate(eval_model, params, cfg.data_dir,
                           batch_size=cfg.valid_batch)
            log("%03d epoch \n Average PSNR %.2f dB" % (epoch_idx, val))
            log_metric(epoch=epoch_idx, psnr=val)
            if tb:
                tb.add_scalar("PSNR", val, epoch_idx)
            if val >= best_psnr:
                best_psnr = val
                ckpt.save_best(params)

    ckpt.save_final(params)
    ckpt.wait()  # all async saves durable before train() returns
    if tb:
        tb.close()
    if logf:
        logf.close()
    if metricsf:
        metricsf.close()
    return params, opt_state
