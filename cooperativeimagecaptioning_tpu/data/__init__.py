"""Data layer: cocotalk json/h5 readers, feature stores, batcher, prefetcher."""

from cooperativeimagecaptioning_tpu.data.loader import DataLoader  # noqa: F401
from cooperativeimagecaptioning_tpu.data.sources import (  # noqa: F401
    DirFeatureSource, LmdbFeatureSource, SyntheticDataset, open_feature_source)
