"""Measure delta block caching operating points on the real TPU.

Compares the exact 1024px kv-compress trajectory against interval and
adaptive (TeaCache-style) refresh policies. Timing uses the sound pattern
for the tunneled backend (whole trajectory = one jitted program, reduce to a
scalar, device_get as the completion barrier — see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
    from pixart_sigma_tpu.pipelines import PixArtPipeline

    BATCH = int(os.environ.get("BENCH_BATCH", "12"))
    STEPS = 20
    H = W = 128

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, H, W, 4), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(BATCH, 300, 4096), dtype=jnp.bfloat16)
    null_y = jnp.asarray(rng.randn(BATCH, 300, 4096), dtype=jnp.bfloat16)
    mask = jnp.ones((2 * BATCH, 300), dtype=jnp.int32)
    hw = jnp.ones((BATCH, 2), jnp.float32)
    ar = jnp.ones((BATCH, 1), jnp.float32)

    pipes = {}

    def get_pipe(quant: bool):
        """PixArtPipeline, optionally with the int8 (W8A8) serving path —
        the cache x int8 composite is the production turbo stack."""
        if quant not in pipes:
            cfg = PixArtConfig(
                input_size=128,
                model_max_length=300,
                pe_interpolation=2.0,
                dtype=jnp.bfloat16,
                kv_compress_sampling="conv",
                kv_compress_scale=2,
                kv_compress_layers=tuple(range(14, 28)),
                cache_span=(7, 21),
                quant_int8=quant,
            )
            model = PixArt(cfg)
            params = jax.jit(
                lambda: model.init(
                    jax.random.PRNGKey(0), x[:1].astype(jnp.bfloat16),
                    jnp.zeros((1,)), y[:1], mask[:1],
                )
            )()
            pipes[quant] = (PixArtPipeline(model, params, base_resolution=1024),
                            params)
        return pipes[quant]

    def run_case(name, build, params):
        fn = build()
        out = fn(params, x, y, null_y, mask, hw, ar)
        jax.device_get(jnp.sum(jnp.abs(out.astype(jnp.float32))))  # warm+barrier
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(params, x, y, null_y, mask, hw, ar)
            s = jax.device_get(jnp.sum(jnp.abs(out.astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "case": name, "s_per_batch": round(dt, 4),
            "img_s": round(BATCH / dt, 4), "checksum_finite": bool(np.isfinite(s)),
        }))

    import sys

    cases = sys.argv[1:] or ["exact", "adaptive0.15"]
    for c in cases:
        name = c
        quant = c.startswith("int8")
        if quant:
            c = c[len("int8"):] or "exact"
        pipe, params = get_pipe(quant)
        if c == "exact":
            run_case(name, lambda: pipe._build_dpm(
                BATCH, H, W, STEPS, 4.5, False), params)
        elif c.startswith("interval"):
            n = int(c[len("interval"):])
            run_case(name, lambda n=n: pipe._build_dpm_cached(
                BATCH, H, W, STEPS, 4.5, False, n), params)
        elif c.startswith("adaptive"):
            thr = float(c[len("adaptive"):])
            run_case(name, lambda thr=thr: pipe._build_dpm_cached(
                BATCH, H, W, STEPS, 4.5, False, 0, adaptive_threshold=thr),
                params)
        elif c.startswith("schedule"):
            sched = tuple(int(v) for v in c[len("schedule"):].split("-"))
            run_case(name, lambda s=sched: pipe._build_dpm_cached(
                BATCH, H, W, STEPS, 4.5, False, 0, schedule=s), params)


if __name__ == "__main__":
    main()
