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
    choice = impl
    if impl == "auto":
        choice = _dispatch(q, k, key_mask) if bias is None else "xla"

    if choice == "allheads":
        from pixart_sigma_tpu.ops.flash_attention import crossattn_allheads

        assert bias is None, "allheads kernel: dense bias unsupported; impl='xla'"
        return crossattn_allheads(q, k, v, key_mask=key_mask)
    if choice == "onepass":
        from pixart_sigma_tpu.ops.flash_attention import onepass_attention

        assert bias is None, "onepass kernel: dense bias unsupported; impl='xla'"
        return onepass_attention(q, k, v, key_mask=key_mask)
    if choice == "headsmajor":
        from pixart_sigma_tpu.ops.flash_attention import crossattn_headsmajor

        assert bias is None, "headsmajor kernel: dense bias unsupported; impl='xla'"
        assert key_mask is not None, "headsmajor kernel needs a key_mask"
        return crossattn_headsmajor(q, k, v, key_mask=key_mask)
    if choice == "flash":
        from pixart_sigma_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, key_mask=key_mask)
    if choice != "xla":
        raise ValueError(
            f"unknown attention impl {choice!r}; expected one of "
            "'auto', 'xla', 'flash', 'onepass', 'allheads', 'headsmajor'"
        )

    if key_mask is not None:
        key_bias = jnp.where(key_mask[:, None, None, :], 0.0, -jnp.inf).astype(
            jnp.float32
        )
        bias = key_bias if bias is None else bias + key_bias
    return _xla_attention(q, k, v, bias, fp32_softmax)


def _dispatch(q: jnp.ndarray, k: jnp.ndarray, key_mask) -> str:
    """Pick the fastest path on TPU (gates tuned from v5e measurements)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return "xla"
    if platform != "tpu":
        return "xla"
    from pixart_sigma_tpu.ops import flash_attention as fa

    B, N, M, Dh = q.shape[0], q.shape[1], k.shape[1], q.shape[-1]
    if Dh < 128 and fa.onepass_supported(N, M, Dh):
        # one-pass kernel: whole K/V resident in VMEM, exact row max, no HBM
        # logits. v5e measurements (B=16, H=16, Dh=72): self-attn N=M=4096
        # 24.2 -> 17.5 ms, kv-compressed M=1024 14.1 -> 7.6 ms. For masked
        # cross-attn (M=300 captions) the fused XLA softmax stays ahead
        # end-to-end (bench 0.421 vs 0.407 img/s) until N is huge and the
        # XLA path's [N, M] f32 logits HBM roundtrip dominates.
        if key_mask is not None:
            # short-key caption cross-attention: the all-heads kernel reads
            # q / writes out in the flat [B, N, C] layout (no head transpose
            # materialisation) — 4.7 vs 5.5 ms at B=16/N=4096/M=300 on v5e.
            # Standalone at B=24 the kernel measures slower (6.5 vs 5.8 ms)
            # but END-TO-END it still wins (bench 0.434 vs 0.430 img/s): the
            # XLA path pays extra head-split transposes that fuse away in
            # isolation but not inside the full block. Trust the e2e number.
            import os

            forced = os.environ.get("PIXART_CROSSATTN_IMPL")
            if forced:
                return forced
            if fa.allheads_supported(N, M, key_mask):
                return "allheads"
            return "onepass" if N >= 8192 else "xla"
        return "onepass" if N >= 2048 else "xla"
    if key_mask is not None:
        # masked attention with K/V too large for the one-pass kernel
        return "flash" if (N >= 8192 and M >= 2048 and Dh % 128 != 0) else "xla"
    # huge self-attention (2K/4K grids): XLA OOMs materialising the logits —
    # the online-softmax flash kernel is mandatory
    return "flash" if N >= 8192 else "xla"
