"""Benchmark: 1024px images/sec/chip at 20-step DPM-Solver++ CFG 4.5.

The north-star metric from BASELINE.json. Measures the full denoising
trajectory (20 NFE, CFG-batched 2x forward, PixArt-Sigma-XL-2 0.6B, bf16,
latents 128x128x4 = 4096 tokens) compiled as ONE jitted program on the real
TPU chip.

Prints the headline JSON line FIRST (driver contract), then one additional
row: the honest end-to-end number including the SDXL-VAE decode to 1024px
RGB (the decode is ~arch-bound, so random weights measure the real cost).
T5 encode stays excluded: one 300-token XXL encode per batch is amortised
across all images of a prompt set and no weights ship in this image.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is an ESTIMATE against A100 fp16 at the same op point (~0.4 img/s at
batch 1; xformers-era PixArt-Sigma 1024px ~2.5 s/img) — i.e. value/0.4.
Each row carries a "note" saying so.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
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

    BATCH = 12  # swept 8/12/16 with the one-pass kernel: 12 is the optimum
    STEPS = 20
    H = W = 128  # 1024px / 8

    # the reference's production 1024px operating point includes Sigma KV
    # compression (configs/pixart_sigma_config/..._internalms_kvcompress.py:
    # conv x2, layers 14-27)
    cfg = PixArtConfig(
        input_size=128,
        model_max_length=300,
        pe_interpolation=2.0,
        dtype=jnp.bfloat16,
        kv_compress_sampling="conv",
        kv_compress_scale=2,
        kv_compress_layers=tuple(range(14, 28)),
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, H, W, 4), dtype=jnp.float32)
    y_cond = jnp.asarray(rng.randn(BATCH, 300, 4096), dtype=jnp.bfloat16)
    y_uncond = jnp.asarray(rng.randn(BATCH, 300, 4096), dtype=jnp.bfloat16)
    mask = jnp.ones((2 * BATCH, 300), dtype=jnp.int32)

    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), x[:1].astype(jnp.bfloat16),
            jnp.zeros((1,)), y_cond[:1], mask[:1],
        )
    )()

    betas = named_beta_schedule("linear", 1000)
    ns = NoiseScheduleVP("discrete", betas=betas)

    @jax.jit
    def sample(params, x0):
        # caption K/V hoisted out of the NFE loop (depend only on y; paid
        # once per trajectory — measured ~3% of the step at this op point)
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
        return solver.sample(x0, steps=STEPS, order=2, method="multistep")

    # warmup / compile. NOTE: block_until_ready does not reliably wait on the
    # tunneled TPU backend here — jax.device_get (host transfer) is the only
    # sound completion barrier, so we time with device_get of a reduction.
    sampled = jax.jit(lambda p, x: jnp.sum(sample(p, x).astype(jnp.float32)))
    jax.device_get(sampled(params, x))

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        jax.device_get(sampled(params, x))
    dt = (time.perf_counter() - t0) / iters

    img_per_sec = BATCH / dt
    baseline_a100 = 0.4  # img/s, A100 fp16 20-step DPM-Solver (see docstring)
    note = "vs_baseline is an estimate: reference publishes no numbers; A100 fp16 ~0.4 img/s assumed"
    print(
        json.dumps(
            {
                "metric": "1024px_images_per_sec_per_chip_20step_dpmsolver_cfg4.5",
                "value": round(img_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / baseline_a100, 4),
                "note": note,
            }
        )
    )

    # ---- turbo serving row: int8 W8A8 x delta block cache interval 2 -----
    # the quality-validated production preset (configs/..._serving_turbo.py;
    # toy rel-FID: int8 0.72 vs bf16 0.76, interval-2 cache neutral — see
    # docs/performance.md §turbo). Same op point, composite speedup.
    from pixart_sigma_tpu.pipelines import PixArtPipeline

    turbo_cfg = PixArtConfig(
        input_size=128,
        model_max_length=300,
        pe_interpolation=2.0,
        dtype=jnp.bfloat16,
        kv_compress_sampling="conv",
        kv_compress_scale=2,
        kv_compress_layers=tuple(range(14, 28)),
        cache_span=(7, 21),
        quant_int8=True,
    )
    turbo_model = PixArt(turbo_cfg)
    turbo_params = jax.jit(
        lambda: turbo_model.init(
            jax.random.PRNGKey(0), x[:1].astype(jnp.bfloat16),
            jnp.zeros((1,)), y_cond[:1], mask[:1],
        )
    )()
    pipe = PixArtPipeline(turbo_model, turbo_params, base_resolution=1024)
    turbo_fn = pipe._build_dpm_cached(BATCH, H, W, STEPS, 4.5, False, 2)
    hw_c = jnp.ones((BATCH, 2), jnp.float32)
    ar_c = jnp.ones((BATCH, 1), jnp.float32)

    def run_turbo():
        out = turbo_fn(turbo_params, x, y_cond, y_uncond, mask, hw_c, ar_c)
        return jax.device_get(jnp.sum(jnp.abs(out.astype(jnp.float32))))

    run_turbo()  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run_turbo()
    turbo_dt = (time.perf_counter() - t0) / iters
    turbo = BATCH / turbo_dt
    print(
        json.dumps(
            {
                "metric": "1024px_images_per_sec_per_chip_turbo_int8_cacheint2",
                "value": round(turbo, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(turbo / baseline_a100, 4),
                "vs_exact": round(turbo / img_per_sec, 3),
                "checksum_finite": bool(np.isfinite(s)),
                "note": note + "; quality-validated preset (docs/performance.md §turbo)",
            }
        )
    )

    # ---- honest end-to-end row: + SDXL-VAE decode to 1024px RGB ----------
    from pixart_sigma_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig.sdxl())
    vparams = jax.jit(
        lambda: vae.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)), jax.random.PRNGKey(2)
        )
    )()
    dec = jax.jit(
        lambda p, z: jnp.sum(
            vae.apply(p, z, method=AutoencoderKL.decode).astype(jnp.float32)
        )
    )
    z1 = x[:1] / 0.13025  # one latent; decode is per-image (memory-bound)
    jax.device_get(dec(vparams, z1))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(dec(vparams, z1))
    decode_per_img = (time.perf_counter() - t0) / iters
    e2e = BATCH / (dt + decode_per_img * BATCH)
    print(
        json.dumps(
            {
                "metric": "1024px_images_per_sec_per_chip_e2e_sampling_plus_vae_decode",
                "value": round(e2e, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(e2e / baseline_a100, 4),
                "decode_s_per_img": round(decode_per_img, 3),
                "note": note,
            }
        )
    )


if __name__ == "__main__":
    main()
