#!/usr/bin/env python
"""4K (65,536-token) per-layer accounting + flash block-shape retune.

Round-3 VERDICT next #3: the 1024px operating point got a per-layer ms
table that fully explained the forward (docs/performance.md); the 4K path
never did, and the flash kernel's tiles were tuned at <=16k tokens. This
measures, at the 4K op point (4096px -> 512x512 latents -> N=256*256=65,536
tokens, CFG batch 2, bf16, kv-compress conv x2 on layers 14-27):

  - full self-attention (N=M=65,536) across flash tile shapes
  - kv-compressed self-attention (M=16,384) across tile shapes
  - caption cross-attention (M=300)
  - the block MLP (2x matmul 1152<->4608) and qkv/proj Denses
  - the kv-compress conv downsample
and prints the per-layer sum vs the measured full forward (bench_hires).

Timing per CLAUDE.md: op inside ONE jitted lax.scan with a data dependency,
scalar-reduced, jax.device_get fetched.

Usage: python scripts/bench_4k.py [--reps 4] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, reps):
    @jax.jit
    def prog(*a):
        def body(carry, _):
            q = a[0] + (carry * 1e-6).astype(a[0].dtype)
            out = fn(q, *a[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c

    jax.device_get(prog(*args))
    t0 = time.perf_counter()
    jax.device_get(prog(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)  # CFG-doubled B=1
    ap.add_argument("--seq", type=int, default=65536)
    args = ap.parse_args()

    from pixart_sigma_tpu.ops.attention import attention
    from pixart_sigma_tpu.ops.flash_attention import flash_attention
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    B, H, Dh, D = args.batch, 16, 72, 1152
    N = args.seq
    Mc = N // 4  # kv-compress conv x2 spatially
    rng = np.random.RandomState(0)

    def mk(n):
        return jnp.asarray(rng.randn(B, n, H, Dh), jnp.bfloat16)

    rows = []

    def report(name, ms, true_tf=None):
        row = {"name": name, "ms": round(ms * 1e3, 2)}
        if true_tf is not None:
            row["tf_s"] = round(true_tf / ms, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- full self-attention tile sweep ---
    q, k, v = mk(N), mk(N), mk(N)
    tf = 4 * B * H * N * N * Dh / 1e12
    best = None
    for bq, bk in ((1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096),
                   (512, 2048), (4096, 2048)):
        try:
            dt = timed(
                lambda q, k, v: flash_attention(q, k, v, block_q=bq,
                                                block_k=bk),
                (q, k, v), args.reps,
            )
            report(f"self_full_65k bq={bq} bk={bk}", dt, tf)
            if best is None or dt < best[0]:
                best = (dt, bq, bk)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": f"self_full_65k bq={bq} bk={bk}",
                              "error": str(e)[:120]}), flush=True)
    self_full = best[0]

    # --- kv-compressed self-attention sweep ---
    kc, vc = mk(Mc), mk(Mc)
    tfc = 4 * B * H * N * Mc * Dh / 1e12
    bestc = None
    for bq, bk in ((1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096)):
        try:
            dt = timed(
                lambda q, k, v: flash_attention(q, k, v, block_q=bq,
                                                block_k=bk),
                (q, kc, vc), args.reps,
            )
            report(f"self_kvc_65k/16k bq={bq} bk={bk}", dt, tfc)
            if bestc is None or dt < bestc[0]:
                bestc = (dt, bq, bk)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": f"self_kvc bq={bq} bk={bk}",
                              "error": str(e)[:120]}), flush=True)
    self_kvc = bestc[0]

    # --- cross-attention (auto dispatch) ---
    M = 300
    kx, vx = mk(M), mk(M)
    km = jnp.asarray(np.arange(M)[None] < 180) | jnp.zeros((B, 1), bool)
    cross = timed(
        lambda q, k, v: attention(q, k, v, key_mask=km, fp32_softmax=True),
        (q, kx, vx), args.reps,
    )
    report("cross_65k/300 (auto)", cross, 4 * B * H * N * M * Dh / 1e12)

    # --- dense matmuls of one block ---
    x = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, jnp.bfloat16)
    w_proj = jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(D, 4 * D) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(4 * D, D) * 0.02, jnp.bfloat16)

    qkv_t = timed(lambda x, w: x @ w, (x, w_qkv), args.reps)
    report("qkv_dense", qkv_t, 2 * B * N * D * 3 * D / 1e12)
    proj_t = timed(lambda x, w: x @ w, (x, w_proj), args.reps)
    report("proj_dense", proj_t, 2 * B * N * D * D / 1e12)
    mlp_t = timed(
        lambda x, w1, w2: jax.nn.gelu(x @ w1) @ w2, (x, w1, w2), args.reps
    )
    report("mlp", mlp_t, 2 * B * N * D * 8 * D / 1e12)

    # --- kv-compress conv downsample (k and v) ---
    h = w = int(N**0.5)
    xs = jnp.asarray(rng.randn(B, h, w, D), jnp.bfloat16)
    kern = jnp.asarray(np.full((2, 2, 1, D), 0.25), jnp.bfloat16)

    def dw(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=D,
        )

    conv_t = timed(dw, (xs, kern), args.reps)
    report("kv_conv_downsample (x2 per layer)", conv_t)

    # --- per-layer accounting ---
    # cross-attn q/kv/proj denses ~ qkv(1/3 size)+proj; approximate with
    # proj_dense * 3 (q_linear + kv_linear(2D out) + proj)
    full_layer = self_full + cross + qkv_t + proj_t * 4 + mlp_t
    kvc_layer = self_kvc + cross + qkv_t + proj_t * 4 + mlp_t + 2 * conv_t
    total = 14 * full_layer + 14 * kvc_layer
    print(json.dumps({
        "name": "accounting",
        "full_layer_ms": round(full_layer * 1e3, 1),
        "kvc_layer_ms": round(kvc_layer * 1e3, 1),
        "predicted_forward_s": round(total, 2),
        "best_full_tiles": best[1:],
        "best_kvc_tiles": bestc[1:],
    }), flush=True)


if __name__ == "__main__":
    main()
