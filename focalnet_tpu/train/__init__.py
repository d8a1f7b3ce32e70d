"""Training loop, losses, LR schedule, checkpointing."""

from focalnet_tpu.train.checkpoint import CheckpointManager, load_params
from focalnet_tpu.train.losses import bilinear_down, fft_l1, multiscale_loss
from focalnet_tpu.train.schedule import make_schedule, warmup_cosine_epoch_lr
from focalnet_tpu.train.trainer import (
    init_params,
    make_optimizer,
    make_train_step,
    set_lr,
    train,
)

__all__ = [
    "multiscale_loss", "fft_l1", "bilinear_down",
    "warmup_cosine_epoch_lr", "make_schedule",
    "CheckpointManager", "load_params",
    "make_optimizer", "make_train_step", "init_params", "set_lr", "train",
]
