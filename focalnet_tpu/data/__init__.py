"""RESIDE-ITS data pipeline (pairing rule, paired augment, prefetch)."""

from focalnet_tpu.data.reside import (
    EvalLoader,
    ResideDataset,
    TrainLoader,
    make_synthetic_dataset,
    paired_hflip,
    paired_random_crop,
)

__all__ = [
    "ResideDataset", "TrainLoader", "EvalLoader",
    "paired_random_crop", "paired_hflip", "make_synthetic_dataset",
]
