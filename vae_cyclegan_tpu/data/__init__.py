"""Host-side data pipeline: dataset formats, synchronized augmentation,
batched prefetching loader feeding sharded device buffers."""

from vae_cyclegan_tpu.data.transforms import AugmentConfig, ColorJitterConfig
from vae_cyclegan_tpu.data.datasets import (
    HypersimDataset,
    SatelliteMapDataset,
    Summer2WinterDataset,
    Subset,
    split_dataset,
)
from vae_cyclegan_tpu.data.loader import DataLoader
from vae_cyclegan_tpu.data.cache import DecodedImageCache
