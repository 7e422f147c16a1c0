"""Flax model zoo: PixArt / PixArtMS DiT denoisers, T5 encoder, SDXL VAE."""

from pixart_sigma_tpu.models.pixart import (  # noqa: F401
    PixArt,
    PixArtConfig,
    PixArt_XL_2,
    PixArtMS_XL_2,
)
