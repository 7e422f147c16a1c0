"""Data pipeline: aspect-ratio buckets, datasets, samplers, loaders.

Torch-free (numpy + PIL); batches come out as numpy dicts ready for
device_put onto the mesh. Static-shape friendly: every aspect-ratio bucket is
one fixed (H, W), so XLA compiles one program per bucket.
"""

from pixart_sigma_tpu.data.aspect import (  # noqa: F401
    ASPECT_RATIO_256,
    ASPECT_RATIO_512,
    ASPECT_RATIO_1024,
    ASPECT_RATIO_2048,
    ASPECT_RATIO_2880,
    ASPECT_RATIO_256_TEST,
    ASPECT_RATIO_512_TEST,
    ASPECT_RATIO_1024_TEST,
    ASPECT_RATIO_2048_TEST,
    ASPECT_RATIO_2880_TEST,
    aspect_ratio_table,
    get_chunks,
    get_closest_ratio,
)
from pixart_sigma_tpu.data.datasets import (  # noqa: F401
    PixArtDataset,
    PixArtMSDataset,
)
from pixart_sigma_tpu.data.sampler import (  # noqa: F401
    AspectRatioBatchSampler,
    BalancedAspectRatioBatchSampler,
    ShardedBatchSampler,
)
from pixart_sigma_tpu.data.loader import DataLoader  # noqa: F401
