"""Hoisted cross-attention K/V parity (round-3 perf item).

precompute_cross_kv replays CaptionEmbedder + per-block kv_linear on the
param tree once per trajectory; the forward with `cross_kv` must match the
plain forward exactly (same dtype ops, same contraction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixart_sigma_tpu.models.pixart import (
    PixArt,
    PixArtConfig,
    precompute_cross_kv,
)

DIMS = dict(input_size=16, patch_size=2, hidden_size=48, depth=3,
            num_heads=4, caption_channels=32, model_max_length=8,
            dtype=jnp.float32, multi_scale=False)


@pytest.mark.parametrize("scan_blocks", [True, False])
@pytest.mark.parametrize("cache_span", [None, (1, 2)])
def test_hoisted_kv_matches_plain_forward(scan_blocks, cache_span):
    cfg = PixArtConfig(
        scan_blocks=scan_blocks, cache_span=cache_span,
        kv_compress_sampling="ave", kv_compress_scale=2,
        kv_compress_layers=(1,), **DIMS,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    B, L = 2, 8
    x = jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(B, L, 32), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 8, [1] * 5 + [0] * 3], np.int32))
    t = jnp.asarray([10.0, 900.0])
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)["params"]

    kwargs = {}
    if cache_span is not None:
        # exercise the nn.cond cached path with compute branch active
        kwargs = dict(
            block_cache=jnp.zeros((B, 64, 48)),
            use_block_cache=jnp.asarray(False),
        )
    base = model.apply({"params": params}, x, t, y, mask, **kwargs)
    kvs = precompute_cross_kv(params, cfg, y)
    hoisted = model.apply(
        {"params": params}, x, t, y, mask, cross_kv=kvs, **kwargs
    )
    if cache_span is not None:
        (base, base_c), (hoisted, hoisted_c) = base, hoisted
        np.testing.assert_allclose(
            np.asarray(base_c), np.asarray(hoisted_c), atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(base), np.asarray(hoisted), atol=1e-6)
