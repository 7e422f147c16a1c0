#!/usr/bin/env python
"""A/B bench: exact bf16 vs dynamic-int8 (W8A8) serving at the headline
operating point (1024px, 20-step DPM-Solver++ CFG 4.5, kv-compress config,
batch 12 — same program as bench.py).

The int8 path quantizes every projection/MLP matmul (QuantDense,
ops/quant.py) with dynamic per-token activation scales and per-channel
weight scales; attention math stays bf16 (Pallas kernels). v5e int8 MXU
peak is 2x bf16, so the measured ratio shows how much of the step those
matmuls are.

Usage: python scripts/bench_int8.py [--batch 12] [--steps 20]
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


def build_sampler(quant: bool, batch: int, steps: int):
    from pixart_sigma_tpu.diffusion.dpm_solver import (
        DPMSolver,
        NoiseScheduleVP,
        make_cfg_model_fn,
    )
    from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule
    from pixart_sigma_tpu.models.pixart import (
        PixArt,
        PixArtConfig,
        precompute_cross_kv,
    )

    cfg = PixArtConfig(
        input_size=128,
        model_max_length=300,
        pe_interpolation=2.0,
        dtype=jnp.bfloat16,
        kv_compress_sampling="conv",
        kv_compress_scale=2,
        kv_compress_layers=tuple(range(14, 28)),
        quant_int8=quant,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 128, 128, 4), dtype=jnp.float32)
    y_cond = jnp.asarray(rng.randn(batch, 300, 4096), dtype=jnp.bfloat16)
    y_uncond = jnp.asarray(rng.randn(batch, 300, 4096), dtype=jnp.bfloat16)
    mask = jnp.ones((2 * batch, 300), dtype=jnp.int32)
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), x[:1].astype(jnp.bfloat16),
            jnp.zeros((1,)), y_cond[:1], mask[:1],
        )
    )()
    ns = NoiseScheduleVP("discrete", betas=named_beta_schedule("linear", 1000))

    @jax.jit
    def sample(params, x0):
        kvs = precompute_cross_kv(
            params["params"], cfg,
            jnp.concatenate([y_uncond, y_cond], axis=0),
        )

        def apply_fn(x_in, t_vec, cond, **kw):
            out = model.apply(
                params, x_in.astype(jnp.bfloat16), t_vec, cond, mask,
                cross_kv=kvs,
            )
            return out[..., :4]

        model_fn = make_cfg_model_fn(
            apply_fn, ns, condition=y_cond, uncondition=y_uncond, cfg_scale=4.5
        )
        solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
        return solver.sample(x0, steps=steps, order=2, method="multistep")

    fn = jax.jit(lambda p, x0: jnp.sum(sample(p, x0).astype(jnp.float32)))
    return fn, params, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="exact,int8")
    args = ap.parse_args()

    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    for mode in args.modes.split(","):
        quant = mode.strip() == "int8"
        fn, params, x = build_sampler(quant, args.batch, args.steps)
        jax.device_get(fn(params, x))  # compile+run barrier (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            jax.device_get(fn(params, x))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "mode": mode.strip(),
            "batch": args.batch,
            "steps": args.steps,
            "s_per_traj": round(dt, 3),
            "img_per_sec": round(args.batch / dt, 4),
        }))


if __name__ == "__main__":
    main()
