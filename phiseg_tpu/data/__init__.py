"""Data layer: LIDC pipeline, synthetic dataset, batch providers, augmentation."""

from phiseg_tpu.data.batch_provider import BatchProvider
from phiseg_tpu.data.registry import get_dataset

__all__ = ["BatchProvider", "get_dataset"]
