"""Attention dispatcher: XLA einsum path + (optional) Pallas flash kernel.

Replaces the reference's xformers.memory_efficient_attention calls
(PixArt_blocks.py:53,153). Layout is [B, N, H, Dh] (batch, tokens, heads,
head_dim) to match the xformers convention used by the reference.

Key design change vs the reference (SURVEY.md §7 "hard parts"): variable
caption lengths are handled with a padded [B, M] key mask folded into an
additive bias, instead of xformers' ragged BlockDiagonalMask packing. Padded
keys receive -inf logits, so the numerics are identical to packing while
keeping every shape static for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    fp32_softmax: bool,
) -> jnp.ndarray:
    """Reference-quality attention via einsum; XLA fuses this well on TPU.

    Inputs stay in their storage dtype (bf16) so the MXU runs at full bf16
    rate; `preferred_element_type=f32` gives f32 accumulation, and the
    softmax itself runs in f32 when fp32_softmax is set — same numerics as
    upcasting the operands, ~2x faster.
    """
    B, N, H, Dh = q.shape
    scale = Dh**-0.5
    dtype = q.dtype
    acc_t = jnp.float32 if fp32_softmax else dtype
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=acc_t
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(dtype), v, preferred_element_type=acc_t
    )
    return out.astype(dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    fp32_softmax: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, N, H, Dh]; k, v: [B, M, H, Dh]
    key_mask: [B, M] bool — True for valid keys (padded keys masked out)
    bias: [B, H, N, M] or broadcastable additive bias
    impl: 'auto' | 'xla' | 'flash'
    """
    if (
        impl == "flash"
        or (impl == "auto" and bias is None and _flash_ok(q, k, key_mask))
    ):
        from pixart_sigma_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, key_mask=key_mask)

    if key_mask is not None:
        key_bias = jnp.where(key_mask[:, None, None, :], 0.0, -jnp.inf).astype(
            jnp.float32
        )
        bias = key_bias if bias is None else bias + key_bias
    return _xla_attention(q, k, v, bias, fp32_softmax)


def _flash_ok(q: jnp.ndarray, k: jnp.ndarray, key_mask) -> bool:
    """Use the Pallas kernel on TPU when it beats the fused XLA path."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    if platform != "tpu":
        return False
    if key_mask is not None:
        # masked attention (mask riding a spare padded lane). At small M
        # (300-token captions) per-program overheads lose to XLA's fused
        # softmax; flash only pays off when the logits get huge on BOTH dims
        return (
            q.shape[1] >= 8192 and k.shape[1] >= 2048
            and q.shape[-1] % 128 != 0
        )
    # self-attention: the XLA fused path wins up to ~4k tokens (head-dim
    # padding costs the kernel ~1.8x MXU work at Dh=72); beyond that XLA
    # OOMs materialising the logits — flash is mandatory for 2K/4K grids
    return q.shape[1] >= 8192
