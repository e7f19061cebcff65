"""Host-side data pipeline (tf.data) and device-side mixup."""

from .pipeline import (
    DataConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
    make_dataset,
    mixup_cutmix,
    synthetic_batches,
)

__all__ = [
    "DataConfig", "IMAGENET_MEAN", "IMAGENET_STD", "make_dataset",
    "mixup_cutmix", "synthetic_batches",
]
