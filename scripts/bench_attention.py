"""Microbenchmark: attention impls (xla / flash / onepass / chunked) on the real TPU.

Production shapes for the 1024px kv-compress operating point (CFG-doubled
batch 16, 16 heads, head dim 72):
  - self-attention, full layers:          N = M = 4096
  - self-attention, kv-compressed layers: N = 4096, M = 1024
  - cross-attention (300-token captions): N = 4096, M = 300 (masked)

Timing pattern per CLAUDE.md: the repeated op lives inside ONE jitted
lax.scan with an iteration-to-iteration data dependency (so XLA cannot hoist
it), reduced to a scalar and fetched with jax.device_get (the only sound
completion barrier on the tunneled backend).

Usage: python scripts/bench_attention.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.ops.attention import attention
from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache


def timed(fn, args, reps: int) -> float:
    @jax.jit
    def prog(*a):
        def body(carry, _):
            q = a[0] + (carry * 1e-6).astype(a[0].dtype)
            out = fn(q, *a[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return c

    jax.device_get(prog(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(prog(*args))
    return (time.perf_counter() - t0) / reps


def flops(B, N, M, H, Dh):
    return 4 * B * H * N * M * Dh  # 2 matmuls x 2 flops (true, unpadded)


def main() -> None:
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    B, H, Dh = 16, 16, 72

    cases = [
        ("self_full", 4096, 4096, None),
        ("self_kvc", 4096, 1024, None),
        ("cross", 4096, 300, 180),  # mask: 180 valid caption tokens
    ]
    for name, N, M, valid in cases:
        q = jnp.asarray(rng.randn(B, N, H, Dh), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, M, H, Dh), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, M, H, Dh), jnp.bfloat16)
        km = None
        if valid is not None:
            km = jnp.asarray(np.arange(M)[None] < valid) | jnp.zeros(
                (B, 1), bool
            )
        tf = flops(B, N, M, H, Dh) / 1e12
        for impl in ("xla", "flash", "onepass", "chunked"):
            if impl == "onepass" and M > 4096:
                continue
            try:
                dt = timed(
                    lambda q, k, v: attention(
                        q, k, v, key_mask=km, fp32_softmax=True, impl=impl
                    ),
                    (q, k, v),
                    reps,
                )
                print(
                    f"{name:10s} {impl:8s} {dt * 1e3:8.2f} ms"
                    f"   {tf / dt:7.1f} TF/s (true flops)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{name:10s} {impl:8s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
