"""MAE-style token masking utilities (random / FFT / Laplacian weighted).

Spec: /root/reference/diffusion/model/utils.py:192-307 (get_mask,
mask_out_token, mask_tokens, unmask_tokens). Used by the masked-training
option (config mask_ratio / mask_type). JAX-functional: explicit rng, gather
via jnp.take_along_axis, FFT strength via jnp.fft.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def get_mask(
    rng: jax.Array,
    batch: int,
    length: int,
    mask_ratio: float,
    mask_type: str = "random",
    strength: Optional[jnp.ndarray] = None,  # [B, L] importance for fft/laplacian
    extra_len: int = 0,
) -> Dict[str, jnp.ndarray]:
    """{'mask' [B,L] (0 keep, 1 remove), 'ids_keep', 'ids_restore', 'ids_removed'}."""
    assert mask_type in ("random", "group", "fft", "laplacian")
    len_keep = int(length * (1 - mask_ratio)) - extra_len

    if mask_type in ("random", "group"):
        noise = jax.random.uniform(rng, (batch, length))
        ids_shuffle = jnp.argsort(noise, axis=1)
    else:
        assert strength is not None, "fft/laplacian masking needs strengths"
        p = strength / (jnp.max(strength, axis=1, keepdims=True) + 1e-5)
        p = jnp.clip(p, 1e-5, 1.0)
        # weighted sampling without replacement == argsort of Gumbel-perturbed
        # log-probs (equivalent to sequential torch.multinomial)
        g = jax.random.gumbel(rng, (batch, length))
        ids_shuffle = jnp.argsort(-(jnp.log(p) + g), axis=1)

    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    ids_removed = ids_shuffle[:, len_keep:]
    mask = jnp.ones((batch, length))
    mask = mask.at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return {
        "mask": mask,
        "ids_keep": ids_keep,
        "ids_restore": ids_restore,
        "ids_removed": ids_removed,
    }


def fft_strength(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Per-patch FFT magnitude (spec :225-233). img: [B, H, W, C] -> [B, L]."""
    B, H, W, C = img.shape
    x = img.reshape(B, H // patch, patch, W // patch, patch, C)
    f = jnp.fft.fftn(x, axes=(2, 4))
    return jnp.sum(jnp.abs(f), axis=(2, 4, 5)).reshape(B, -1)


def laplacian_strength(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Per-patch Laplacian response (spec :234-240)."""
    B, H, W, C = img.shape
    kernel = jnp.asarray(
        [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], jnp.float32
    ).reshape(3, 3, 1, 1)
    kernel = jnp.tile(kernel, (1, 1, 1, C))
    resp = jax.lax.conv_general_dilated(
        img, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    x = resp.reshape(B, H // patch, patch, W // patch, patch, C)
    return jnp.sum(x, axis=(2, 4, 5)).reshape(B, -1)


def mask_out_token(x: jnp.ndarray, ids_keep: jnp.ndarray):
    """[B, L, D] -> [B, len_keep, D] gathered kept tokens."""
    return jnp.take_along_axis(x, ids_keep[..., None], axis=1)


def unmask_tokens(
    x: jnp.ndarray, ids_restore: jnp.ndarray, mask_token: jnp.ndarray
) -> jnp.ndarray:
    """Scatter kept tokens back; removed positions get the mask token."""
    B, kept, D = x.shape
    L = ids_restore.shape[1]
    fill = jnp.broadcast_to(mask_token.reshape(1, 1, D), (B, L - kept, D))
    x = jnp.concatenate([x, fill], axis=1)
    return jnp.take_along_axis(x, ids_restore[..., None], axis=1)
