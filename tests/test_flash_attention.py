"""Flash-attention kernel parity (fwd + grad) vs the XLA reference path.

Runs in Pallas interpret mode on CPU (the same kernel code compiles with
Mosaic on real TPU; bench.py exercises that).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pixart_sigma_tpu.ops.attention import attention
from pixart_sigma_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "B,N,M,H,Dh,bq,bk",
    [
        (1, 256, 256, 2, 72, 128, 128),   # padded head dim
        (2, 256, 128, 2, 64, 128, 128),   # kv shorter than q (KV compression)
        (1, 512, 512, 1, 128, 256, 128),  # native 128 head dim
    ],
)
def test_flash_forward_matches_xla(B, N, M, H, Dh, bq, bk):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_grads_match_xla():
    rng = np.random.RandomState(1)
    B, N, M, H, Dh = 1, 256, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, impl="xla", fp32_softmax=True) * tangent)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * tangent)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_flash_bf16_inputs():
    rng = np.random.RandomState(2)
    B, N, H, Dh = 1, 256, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=128, block_k=128)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("N,M", [(300, 300), (450, 200), (1000, 250)])
def test_flash_arbitrary_lengths(N, M):
    """Padding + kv tail masking: any (N, M) matches the XLA path."""
    rng = np.random.RandomState(3)
    B, H, Dh = 1, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    want = attention(q, k, v, impl="xla", fp32_softmax=True)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_grads_arbitrary_lengths():
    rng = np.random.RandomState(4)
    B, N, M, H, Dh = 1, 200, 300, 2, 72
    q = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, Dh).astype(np.float32))
    tangent = jnp.asarray(rng.randn(B, N, H, Dh).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(attention(q, k, v, impl="xla", fp32_softmax=True) * tangent)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * tangent)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4, err_msg=name
        )


def test_flash_key_mask_matches_xla():
    """Masked cross-attention via the spare-lane trick == XLA masked path."""
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
        got = flash_attention(q, k, v, key_mask=km, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_flash_key_mask_grads_match_xla():
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

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, key_mask=km, block_q=128, block_k=128)
            * tangent
        )

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4, err_msg=name
        )
