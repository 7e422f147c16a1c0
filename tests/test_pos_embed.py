"""Parity of 2D sin-cos positional embeddings vs the reference."""

import numpy as np
import pytest

from pixart_sigma_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from tests.reference_shim import install_reference

install_reference()
from diffusion.model.nets.PixArt import (  # noqa: E402
    get_2d_sincos_pos_embed as ref_pos_embed,
)


@pytest.mark.parametrize(
    "h,w,interp,base",
    [(16, 16, 1.0, 16), (32, 32, 1.0, 32), (16, 24, 2.0, 64), (8, 8, 0.5, 16)],
)
def test_pos_embed_matches_reference(h, w, interp, base):
    ours = get_2d_sincos_pos_embed(
        1152, h, w, pe_interpolation=interp, base_size=base
    )
    theirs = ref_pos_embed(
        1152, (h, w), pe_interpolation=interp, base_size=base
    ).astype(np.float32)
    assert ours.shape == theirs.shape == (h * w, 1152)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)
