"""Dynamic int8 (W8A8) matmul for quantized serving.

The v5e MXU runs int8xint8->int32 at 2x the bf16 FLOP rate (394 vs 197
TOPS), and the DiT sampling step is MXU-bound (docs/performance.md), so
quantizing the projection/MLP matmuls buys real throughput — an opt-in
serving mode the reference has no analogue for (it serves fp16).

Scheme (standard LLM.int8-style dynamic quantization, no calibration):
  - weights:     symmetric per-OUTPUT-channel scales, round-to-nearest
  - activations: symmetric per-TOKEN (row) scales computed on the fly
  - y = (q_x @ q_w) * (s_x . s_w) + b   accumulated in int32, scaled in f32

Weights are quantized inside the jitted step from the same f32/bf16 params
every checkpoint loader produces — the checkpoint format is unchanged and
the cost (O(params)) is noise next to the [tokens x in x out] matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Per-row symmetric int8 quantization over the last dim.

    Returns (q [int8], scale [..., 1] f32)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (absmax.astype(jnp.float32) / 127.0) + eps
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """Per-output-channel (last dim) symmetric int8 quantization of a
    [in, out] kernel. Returns (q [int8], scale [out] f32)."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = (absmax.astype(jnp.float32) / 127.0) + eps
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[None]), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(
    x: jnp.ndarray,  # [..., in]
    kernel: jnp.ndarray,  # [in, out] (f32/bf16 storage; quantized here)
    bias=None,  # [out] or None
    out_dtype=None,
) -> jnp.ndarray:
    """Dynamic W8A8 y = x @ kernel + bias with int32 MXU accumulation."""
    out_dtype = out_dtype or x.dtype
    qx, sx = quantize_rows(x)
    qw, sw = quantize_cols(kernel)
    acc = jax.lax.dot_general(
        qx,
        qw,
        (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * sw[None]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
