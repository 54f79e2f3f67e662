"""Host-side data pipeline: datasets, augmentation, padded fixed-shape batching."""

from ryolo_tpu.data.loader import load_data, DataLoader  # noqa: F401
from ryolo_tpu.data.datasets import (  # noqa: F401
    BaseDataset,
    CustomDataset,
    DOTADataset,
    ImageDataset,
    UCASAODDataset,
)
