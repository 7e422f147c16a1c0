"""One-pass (full-row softmax) attention kernel parity vs the XLA path.

Runs in Pallas interpret mode on CPU (the same kernel compiles with Mosaic
on real TPU; bench.py exercises that). The one-pass kernel serves the
production token counts (<= 4k keys): 1024px self-attention, all
kv-compressed layers, and 300-token caption cross-attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pixart_sigma_tpu.ops.attention import attention
from pixart_sigma_tpu.ops.flash_attention import (
    onepass_attention,
    onepass_supported,
)


@pytest.mark.parametrize(
    "B,N,M,H,Dh",
    [
        (1, 256, 256, 2, 72),   # padded head dim (PixArt's 72)
        (2, 256, 128, 2, 64),   # kv shorter than q (KV compression)
        (1, 512, 512, 1, 96),
        (1, 384, 300, 2, 72),   # unaligned kv length (caption tail mask)
    ],
)
def test_onepass_forward_matches_xla(B, N, M, H, Dh):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = onepass_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_onepass_grads_match_xla():
    rng = np.random.RandomState(1)
    B, N, M, H, Dh = 1, 256, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, impl="xla", fp32_softmax=True) * tangent)

    def loss_onepass(q, k, v):
        return jnp.sum(onepass_attention(q, k, v, block_q=128) * tangent)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_onepass, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_onepass_bf16_inputs():
    rng = np.random.RandomState(2)
    B, N, H, Dh = 1, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = onepass_attention(q, k, v, block_q=128)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("N,M", [(300, 300), (450, 200), (1000, 250)])
def test_onepass_arbitrary_lengths(N, M):
    rng = np.random.RandomState(3)
    B, H, Dh = 1, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = onepass_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_onepass_key_mask_matches_xla():
    """Masked cross-attention: mask on K's spare lane, denom on V's."""
    rng = np.random.RandomState(5)
    B, N, M, H, Dh = 2, 256, 300, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    key_mask = np.ones((B, M), bool)
    key_mask[0, 120:] = False
    key_mask[1, 7:] = False
    km = jnp.asarray(key_mask)
    want = attention(q, k, v, key_mask=km, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = onepass_attention(q, k, v, key_mask=km, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_onepass_key_mask_grads_match_xla():
    rng = np.random.RandomState(6)
    B, N, M, H, Dh = 1, 128, 200, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    km = jnp.asarray(np.arange(M)[None] < 150)
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, key_mask=km, impl="xla",
                                 fp32_softmax=True) * tangent)

    def loss_onepass(q, k, v):
        return jnp.sum(
            onepass_attention(q, k, v, key_mask=km, block_q=128) * tangent
        )

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_onepass, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4, err_msg=name
        )


def test_onepass_supported_bounds():
    assert onepass_supported(4096, 4096, 72)
    assert onepass_supported(16384, 4096, 72)   # 2K-px kv-compressed layers
    assert onepass_supported(4096, 300, 72)     # caption cross-attention
    assert not onepass_supported(16384, 16384, 72)  # 2K-px full layers


def test_dispatch_explicit_impl():
    """attention(impl='onepass') routes through the kernel on any backend."""
    rng = np.random.RandomState(7)
    B, N, H, Dh = 1, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = attention(q, k, v, impl="onepass")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_allheads_cross_matches_xla():
    """Flat-layout all-heads cross kernel == XLA masked path."""
    from pixart_sigma_tpu.ops.flash_attention import crossattn_allheads

    rng = np.random.RandomState(8)
    B, N, M, H, Dh = 2, 256, 300, 4, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    key_mask = np.ones((B, M), bool)
    key_mask[0, 120:] = False
    key_mask[1, 7:] = False
    km = jnp.asarray(key_mask)
    want = attention(q, k, v, key_mask=km, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = crossattn_allheads(q, k, v, key_mask=km, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_allheads_cross_grads_match_xla():
    from pixart_sigma_tpu.ops.flash_attention import crossattn_allheads

    rng = np.random.RandomState(9)
    B, N, M, H, Dh = 1, 200, 120, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    km = jnp.asarray(np.arange(M)[None] < 90)
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, key_mask=km, impl="xla",
                                 fp32_softmax=True) * tangent)

    def loss_ah(q, k, v):
        return jnp.sum(
            crossattn_allheads(q, k, v, key_mask=km, block_q=128) * tangent
        )

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_ah, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4, err_msg=name
        )


def test_onepass_grads_unaligned_n():
    """Regression: bwd tiles must DIVIDE the padded N (a bare clamp dropped
    the tail q-block, leaving NaN dq rows at e.g. N=640)."""
    rng = np.random.RandomState(10)
    B, N, M, H, Dh = 1, 640, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, impl="xla", fp32_softmax=True) * tangent)

    def loss_onepass(q, k, v):
        return jnp.sum(onepass_attention(q, k, v, block_q=128) * tangent)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_onepass, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert np.isfinite(np.asarray(g)).all(), name
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "B,N,M,H,Dh,bq",
    [
        (2, 640, 300, 4, 72, 256),   # production-like ragged captions
        (1, 512, 120, 2, 72, 256),   # alpha 120-token captions
        (1, 300, 300, 2, 64, 256),   # N not a bq multiple (q tail pad)
        (2, 1024, 300, 4, 72, 512),  # bigger q block
    ],
)
def test_headsmajor_crossattn_matches_xla(B, N, M, H, Dh, bq):
    """Heads-major padded-layout cross-attn kernel (round-3 inference fast
    path; clean 128-aligned per-head blocks instead of the allheads
    kernel's 72-lane-offset slices)."""
    from pixart_sigma_tpu.ops.flash_attention import crossattn_headsmajor

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    mask = np.ones((B, M), bool)
    mask[0, M // 2:] = False
    if B > 1:
        mask[1, 10:] = False  # nearly-empty caption
    want = attention(
        q, k, v, key_mask=jnp.asarray(mask), impl="xla", fp32_softmax=True
    )
    with pltpu.force_tpu_interpret_mode():
        got = crossattn_headsmajor(
            q, k, v, key_mask=jnp.asarray(mask), block_q=bq
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_attention_impl_dispatch_validation():
    """attention() must route impl='headsmajor' to the kernel and reject
    unknown impl strings instead of silently falling through to XLA
    (round-3 ADVICE: a typo'd PIXART_CROSSATTN_IMPL would otherwise make a
    re-tuning run measure XLA while appearing to measure the kernel)."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 512, 2, 72).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 300, 2, 72).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 300, 2, 72).astype(np.float32))
    mask = np.ones((1, 300), bool)
    mask[0, 200:] = False
    want = attention(
        q, k, v, key_mask=jnp.asarray(mask), impl="xla", fp32_softmax=True
    )
    with pltpu.force_tpu_interpret_mode():
        got = attention(q, k, v, key_mask=jnp.asarray(mask), impl="headsmajor")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    with pytest.raises(ValueError, match="unknown attention impl"):
        attention(q, k, v, key_mask=jnp.asarray(mask), impl="headsmjaor")
