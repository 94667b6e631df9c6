"""Host-side input pipeline: datasets, augmentation, sharded loaders."""

from xmc_gan_tpu.data.pipeline import (  # noqa: F401
    DataLoader,
    SentTextDataset,
    SyntheticDataset,
    WordTextDataset,
    index_to_sent,
)
