#!/usr/bin/env python
"""Batch txt2img inference CLI.

Spec: /root/reference/scripts/inference.py:24-224 — loads a PixArt checkpoint
(.pth or diffusers safetensors), T5 + VAE, reads a prompt file (one prompt
per line, optional `--ar h:w` / `--hw h:w` flags inside the prompt), and
writes JPGs with the chosen sampler (dpm-solver 20 / iddpm 100 / sa-solver 25).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="PixArt TPU inference")
    p.add_argument("--config", required=False, default=None,
                   help="model config (else inferred from --image-size)")
    p.add_argument("--model-path", required=True, help=".pth / safetensors / orbax")
    p.add_argument("--t5-path", default=None, help="HF T5 encoder dir")
    p.add_argument("--vae-path", default=None, help="diffusers VAE dir")
    p.add_argument("--image-size", type=int, default=1024,
                   choices=[256, 512, 1024, 2048])
    p.add_argument("--version", default="sigma", choices=["alpha", "sigma"])
    p.add_argument("--txt-file", required=True, help="one prompt per line")
    p.add_argument("--save-root", default="output/samples")
    p.add_argument("--sampling-algo", default="dpm-solver",
                   choices=["dpm-solver", "deis", "sde-dpm-solver",
                            "iddpm", "sa-solver", "lcm", "dmd"])
    p.add_argument("--steps", type=int, default=None,
                   help="default: dpm 20 / iddpm 100 / sa 25 / lcm 4")
    p.add_argument("--cfg-scale", type=float, default=4.5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--block-cache-interval", type=int, default=0,
                   help=">=2 enables delta block caching (turbo; dpm-solver "
                        "only): middle-layer residuals refresh every N NFE. "
                        "RECOMMENDED turbo setting: 2 (+33%% img/s at 1024px "
                        "for ~0 measured relative-FID cost; "
                        "docs/performance.md quality table)")
    p.add_argument("--block-cache-threshold", type=float, default=None,
                   help="adaptive (TeaCache-style) block caching: refresh "
                        "when accumulated latent drift crosses this "
                        "(overrides interval). Measured (docs/performance.md):"
                        " 0.05 quality-neutral/+0%% speed, 0.15 +5%%, 0.3 "
                        "+14%% — interval 2 dominates both; prefer it unless "
                        "your checkpoint regresses at fixed intervals")
    p.add_argument("--block-cache-schedule", type=str, default=None,
                   help="comma-separated NFE indices that refresh the cache "
                        "(scheduled policy; e.g. '0,1,3,6,9,12,15,19'); "
                        "overrides --block-cache-interval")
    p.add_argument("--cache-span", type=str, default="7:21",
                   help="k1:k2 layer span cached by block caching")
    p.add_argument("--vae-flax", default=None,
                   help="dir from scripts/train_vae.py (vae_config.json + "
                        "vae_params.msgpack); alternative to --vae-path")
    p.add_argument("--pseudo-t5", type=int, default=None, metavar="DIM",
                   help="hash-embedding text encoder of this dim (toy "
                        "pipeline, tools/make_toy_dataset.py --pseudo-t5); "
                        "CFG null is the model's learned null caption")
    p.add_argument("--scale-factor", type=float, default=None,
                   help="latent scale override (toy VAE; default per version)")
    p.add_argument("--turbo", action="store_true",
                   help="the quality-validated serving stack: --int8 + "
                        "--block-cache-interval 2 (+49%% at 1024px; "
                        "docs/performance.md §turbo)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 (W8A8) projection/MLP matmuls — "
                        "quantized serving mode (2x MXU rate on v5e)")
    p.add_argument("--seq-parallel", type=int, default=0, metavar="N",
                   help="shard the token dim over N devices (sequence/"
                        "context parallelism; for 2K/4K grids on pods)")
    p.add_argument("--load-ema", action="store_true",
                   help="load EMA params from an orbax train-state checkpoint")
    return p.parse_args()


PE_INTERP = {256: 0.5, 512: 1.0, 1024: 2.0, 2048: 4.0}
DEFAULT_STEPS = {"dpm-solver": 20, "deis": 20, "sde-dpm-solver": 20,
                 "iddpm": 100, "sa-solver": 25, "lcm": 4, "dmd": 1}


def main():
    args = parse_args()
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.data.aspect import get_chunks
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.models.pixart import PixArtMS_XL_2
    from pixart_sigma_tpu.pipelines import PixArtPipeline
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.turbo:
        args.int8 = True
        if args.sampling_algo == "dpm-solver":
            if args.block_cache_interval < 2:
                args.block_cache_interval = 2
        else:
            # block caching is a dpm-solver-only program; other samplers
            # run int8-only rather than erroring (mirrors serve.py --turbo)
            print(f"--turbo: {args.sampling_algo} does not support block "
                  "caching; running int8 only", flush=True)

    if args.config:
        config = read_config(args.config)
        extra = {}
        if args.int8:
            extra["quant_int8"] = True
        if (args.block_cache_interval >= 2 or args.block_cache_threshold is not None
                or args.block_cache_schedule):
            k1, k2 = (int(v) for v in args.cache_span.split(":"))
            extra["cache_span"] = (k1, k2)
        model = build_model_from_config(config, **extra)
    else:
        max_len = 300 if args.version == "sigma" else 120
        extra = {}
        if args.int8:
            extra["quant_int8"] = True
        if (args.block_cache_interval >= 2 or args.block_cache_threshold is not None
                or args.block_cache_schedule):
            k1, k2 = (int(v) for v in args.cache_span.split(":"))
            extra["cache_span"] = (k1, k2)
        model = PixArtMS_XL_2(
            input_size=args.image_size // 8,
            pe_interpolation=PE_INTERP[args.image_size],
            model_max_length=max_len,
            micro_condition=(args.version == "alpha" and args.image_size == 1024),
            **extra,
        )

    params = {"params": ckpt_io.load_checkpoint(
        args.model_path, model.cfg, load_ema=args.load_ema)}

    t5 = None
    if args.pseudo_t5:
        from pixart_sigma_tpu.models.t5 import PseudoT5Embedder

        t5 = PseudoT5Embedder(args.pseudo_t5, model.cfg.model_max_length)
    elif args.t5_path:
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(
            args.t5_path, model_max_length=model.cfg.model_max_length
        )
    vae = vae_params = None
    scale = args.scale_factor or (0.13025 if args.version == "sigma" else 0.18215)
    if args.vae_flax:
        from pixart_sigma_tpu.models.vae import load_flax_vae

        vae, vae_params = load_flax_vae(args.vae_flax)
    elif args.vae_path:
        from pixart_sigma_tpu.models.vae import (
            AutoencoderKL,
            VAEConfig,
            diffusers_vae_to_flax,
        )
        from pixart_sigma_tpu.utils.checkpoint import load_safetensors_state_dict

        vae_cfg = VAEConfig.sdxl(scaling_factor=scale)
        vae = AutoencoderKL(vae_cfg)
        vae_params = {
            "params": diffusers_vae_to_flax(
                load_safetensors_state_dict(args.vae_path), vae_cfg
            )
        }

    base_res = config.get("image_size", args.image_size) if args.config \
        else args.image_size
    mesh = None
    if args.seq_parallel and args.seq_parallel > 1:
        from pixart_sigma_tpu.parallel.mesh import MeshConfig, build_mesh

        mesh = build_mesh(MeshConfig(data=-1, seq=args.seq_parallel))
    pipe = PixArtPipeline(
        model, params, t5=t5, vae=vae, vae_params=vae_params,
        scale_factor=scale, base_resolution=base_res, mesh=mesh,
    )

    # pseudo-T5 has no encoding of "" — CFG null is the learned null caption
    y_null_row = None
    if args.pseudo_t5:
        y_null_row = jnp.asarray(
            params["params"]["y_embedder"]["y_embedding"], jnp.float32)

    with open(args.txt_file) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    os.makedirs(args.save_root, exist_ok=True)
    steps = args.steps or DEFAULT_STEPS[args.sampling_algo]

    idx = 0
    for chunk in get_chunks(prompts, args.bs):
        images = pipe(
            chunk,
            num_inference_steps=steps,
            guidance_scale=args.cfg_scale,
            sampler=args.sampling_algo,
            seed=args.seed + idx,
            y_null=None if y_null_row is None
            else jnp.broadcast_to(y_null_row[None], (len(chunk),) + y_null_row.shape),
            return_latents=(vae is None),
            block_cache_interval=args.block_cache_interval,
            block_cache_threshold=args.block_cache_threshold,
            block_cache_schedule=None if not args.block_cache_schedule
            else [int(v) for v in args.block_cache_schedule.split(",")],
        )
        for j, img in enumerate(images):
            name = f"{idx + j:05d}_{args.sampling_algo}_{steps}.jpg"
            if vae is None:
                np.save(os.path.join(args.save_root, name + ".npy"), img)
            else:
                Image.fromarray(img).save(os.path.join(args.save_root, name))
        idx += len(chunk)
    print(f"wrote {idx} samples to {args.save_root}")


if __name__ == "__main__":
    main()
