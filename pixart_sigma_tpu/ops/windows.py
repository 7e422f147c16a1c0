"""Windowed-attention helpers (partition/unpartition + decomposed rel-pos).

Spec: /root/reference/diffusion/model/utils.py:74-183 (window_partition,
window_unpartition, get_rel_pos, add_decomposed_rel_pos). Present for parity
with the reference's windowed-attention experiments; not used by released
configs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], (Hp, Wp)) with zero padding."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: Tuple[int, int],
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """Inverse of window_partition, cropping the padding."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interpolate a (L, C) rel-pos table to the (q, k) geometry."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return jnp.take(rel_pos, rel.astype(jnp.int32), axis=0)


def add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> jnp.ndarray:
    """MViTv2 decomposed relative position bias added to attention logits."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = (
        attn.reshape(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    )
    return attn.reshape(B, q_h * q_w, k_h * k_w)
