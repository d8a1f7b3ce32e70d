"""LR schedule replicating GradualWarmupScheduler(multiplier=1) + cosine.

Reference semantics (``/root/reference/pytorch-gradual-warmup-lr/warmup_scheduler/scheduler.py:25-63``
driven by ``ITS/train.py:20-23,121``): ``scheduler.step()`` is called once
BEFORE the first epoch and once after each epoch, so the LR actually applied
while training epoch e (1-based) is:

    e <= 3 (warmup):  base_lr * e / 3          (epoch 1 trains at base/3)
    e >= 4 (cosine):  eta_min + (base - eta_min)/2 * (1 + cos(pi * t / T))
                      with t = e - 4, T = num_epoch - warmup_epochs

Note the handoff off-by-one: the cosine scheduler's internal epoch restarts at
0 when warmup finishes (epoch 4 trains at full base_lr) and never reaches
T_max, so the final LR is slightly above eta_min — deliberately preserved.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_epoch_lr(epoch, base_lr: float, num_epoch: int,
                           warmup_epochs: int = 3, eta_min: float = 1e-6):
    """LR for (1-based) epoch ``epoch``; accepts traced arrays."""
    epoch = jnp.asarray(epoch, jnp.float32)
    warm = base_lr * epoch / warmup_epochs
    t = epoch - (warmup_epochs + 1)
    T = num_epoch - warmup_epochs
    cos = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / T))
    return jnp.where(epoch <= warmup_epochs, warm, cos)


def make_schedule(base_lr: float, num_epoch: int, steps_per_epoch: int,
                  warmup_epochs: int = 3, eta_min: float = 1e-6):
    """optax-style schedule: step index -> LR (constant within each epoch,
    mirroring the reference's per-epoch stepping)."""

    def schedule(step):
        epoch = step // steps_per_epoch + 1
        return warmup_cosine_epoch_lr(
            epoch, base_lr, num_epoch, warmup_epochs, eta_min
        )

    return schedule
