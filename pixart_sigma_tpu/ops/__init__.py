"""TPU compute primitives: positional embeddings, attention, Pallas kernels."""

from pixart_sigma_tpu.ops.pos_embed import get_2d_sincos_pos_embed  # noqa: F401
from pixart_sigma_tpu.ops.attention import attention  # noqa: F401
