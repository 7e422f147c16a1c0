"""End-user pipelines: text -> image with any sampler, TPU-compiled."""

from pixart_sigma_tpu.pipelines.pipeline import PixArtPipeline  # noqa: F401
