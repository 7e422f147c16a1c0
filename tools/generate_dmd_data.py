#!/usr/bin/env python
"""Generate DMD training triplets: (fixed noise, teacher base latent) pairs.

Spec: /root/reference/tools/generate_dmd_data_noise_pairs.py:26-123 — for
every item in data_info.json, draw a deterministic init noise, run the
TEACHER model's full sampler from exactly that noise, and persist both the
noise and the resulting base latent as .npy keyed by the item's file stem.
data/dmd_dataset.py reads them back (noise_dir/base_latent_dir) and
training/dmd.py distills the one-step generator against them.

TPU-native differences from the reference: batched sampling through one
jitted dpm-solver program instead of a batch-1 diffusers-pipeline loop;
noise is keyed by (seed, item index) via jax.random.fold_in so any shard of
the dataset can be (re)generated independently and reproducibly; latents are
stored NHWC (the dataset accepts both layouts).

Caption conditioning comes from the precomputed caption .npz dir (the
production path) or --pseudo-t5 hash embeddings (the offline toy path).

Usage (toy):
  python tools/generate_dmd_data.py --data-root /tmp/toy/InternData \
      --config configs/toy/pixart_toy_img128.py \
      --model-path /tmp/toy_run/checkpoints --load-ema \
      --caption-dir caption_features_new --pseudo-t5 0 --batch 24
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="DMD noise/latent pair generator")
    p.add_argument("--data-root", required=True,
                   help="InternData dir holding data_info.json")
    p.add_argument("--config", default=None, help="teacher model config")
    p.add_argument("--model-path", required=True,
                   help="teacher checkpoint (.pth / safetensors / orbax dir)")
    p.add_argument("--load-ema", action="store_true")
    p.add_argument("--image-size", type=int, default=512,
                   help="used when no --config is given")
    p.add_argument("--caption-dir", default="caption_features",
                   help="caption .npz dir under data-root (stem-keyed)")
    p.add_argument("--pseudo-t5", type=int, default=0, metavar="DIM",
                   help=">0: hash-embed prompts instead of reading .npz")
    p.add_argument("--noise-dir", default="noise")
    p.add_argument("--base-latent-dir", default="base_latents")
    p.add_argument("--save-img", action="store_true",
                   help="also decode+save PNGs (needs --vae-flax/--vae-path)")
    p.add_argument("--vae-flax", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--scale-factor", type=float, default=0.13025)
    p.add_argument("--img-dir", default="DMD_images")
    p.add_argument("--sample-nums", type=int, default=640_000,
                   help="cap on items (reference default)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg-scale", type=float, default=4.5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-ratio", type=float, default=4.5,
                   help="drop items with aspect ratio above this (reference)")
    return p.parse_args()


def _stem(item) -> str:
    return item["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0]


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.models.pixart import PixArtMS_XL_2
    from pixart_sigma_tpu.pipelines import PixArtPipeline
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    with open(os.path.join(args.data_root, "data_info.json")) as f:
        meta = json.load(f)
    meta = [m for m in meta if m.get("ratio", 1.0) <= args.max_ratio]
    meta = meta[: args.sample_nums]
    if not meta:
        raise SystemExit("data_info.json matched no items")

    if args.config:
        config = read_config(args.config)
        model = build_model_from_config(config)
        image_size = config.get("image_size", args.image_size)
    else:
        model = PixArtMS_XL_2(
            input_size=args.image_size // 8,
            pe_interpolation={256: 0.5, 512: 1.0, 1024: 2.0}[args.image_size],
        )
        image_size = args.image_size
    params = {"params": ckpt_io.load_checkpoint(
        args.model_path, model.cfg, load_ema=args.load_ema)}

    vae = vae_params = None
    if args.save_img:
        if args.vae_flax:
            from pixart_sigma_tpu.models.vae import load_flax_vae

            vae, vae_params = load_flax_vae(args.vae_flax)
        elif args.vae_path:
            from pixart_sigma_tpu.models.vae import (
                AutoencoderKL,
                VAEConfig,
                diffusers_vae_to_flax,
            )
            from pixart_sigma_tpu.utils.checkpoint import (
                load_safetensors_state_dict,
            )

            cfg = VAEConfig.sdxl(scaling_factor=args.scale_factor)
            vae = AutoencoderKL(cfg)
            vae_params = {"params": diffusers_vae_to_flax(
                load_safetensors_state_dict(args.vae_path), cfg)}
        else:
            raise SystemExit("--save-img needs --vae-flax or --vae-path")

    pipe = PixArtPipeline(
        model, params, vae=vae, vae_params=vae_params,
        scale_factor=args.scale_factor, base_resolution=image_size,
    )
    L = model.cfg.model_max_length

    pseudo = None
    if args.pseudo_t5 > 0:
        from pixart_sigma_tpu.models.t5 import PseudoT5Embedder

        pseudo = PseudoT5Embedder(args.pseudo_t5, L)

    def captions(batch_meta):
        if pseudo is not None:
            return pseudo.get_text_embeddings(
                [m.get("prompt", "") for m in batch_meta])
        ys, masks = [], []
        for m in batch_meta:
            npz = np.load(os.path.join(
                args.data_root, args.caption_dir, _stem(m) + ".npz"))
            fea = np.asarray(npz["caption_feature"], np.float32)
            fea = fea[0] if fea.ndim == 3 else fea
            mask = (np.asarray(npz["attention_mask"], np.int32).reshape(-1)
                    if "attention_mask" in npz
                    else np.ones((fea.shape[0],), np.int32))
            n = min(fea.shape[0], L)
            y = np.zeros((L, fea.shape[1]), np.float32)
            mk = np.zeros((L,), np.int32)
            y[:n], mk[:n] = fea[:n], mask[:n]
            ys.append(y)
            masks.append(mk)
        return jnp.asarray(np.stack(ys)), jnp.asarray(np.stack(masks))

    null_emb = jnp.asarray(
        params["params"]["y_embedder"]["y_embedding"], jnp.float32)

    noise_dir = os.path.join(args.data_root, args.noise_dir)
    latent_dir = os.path.join(args.data_root, args.base_latent_dir)
    os.makedirs(noise_dir, exist_ok=True)
    os.makedirs(latent_dir, exist_ok=True)
    if args.save_img:
        os.makedirs(os.path.join(args.data_root, args.img_dir), exist_ok=True)

    h = w = image_size // 8
    B = args.batch
    key = jax.random.PRNGKey(args.seed)
    done = 0
    for start in range(0, len(meta), B):
        batch = meta[start:start + B]
        pad = B - len(batch)
        noise = np.stack([
            np.asarray(jax.random.normal(
                jax.random.fold_in(key, start + i), (h, w, 4), jnp.float32))
            for i in range(len(batch))
        ])
        if pad:
            noise = np.concatenate(
                [noise, np.repeat(noise[-1:], pad, 0)], axis=0)
        y, y_mask = captions(batch + [batch[-1]] * pad)
        latents = pipe(
            [m.get("prompt", "") for m in batch] + [""] * pad,
            num_inference_steps=args.steps,
            guidance_scale=args.cfg_scale,
            sampler="dpm-solver",
            y=y, y_mask=y_mask,
            y_null=jnp.broadcast_to(null_emb[None], (B,) + null_emb.shape),
            latents=jnp.asarray(noise),
            return_latents=True,
        )
        for i, m in enumerate(batch):
            np.save(os.path.join(noise_dir, _stem(m) + ".npy"), noise[i])
            np.save(os.path.join(latent_dir, _stem(m) + ".npy"),
                    np.asarray(latents[i], np.float32))
        if args.save_img:
            imgs = pipe._latents_to_images(jnp.asarray(latents))
            for i, m in enumerate(batch):
                Image.fromarray(imgs[i]).save(os.path.join(
                    args.data_root, args.img_dir, _stem(m) + ".png"))
        done += len(batch)
        print(f"{done}/{len(meta)} pairs", flush=True)
    print(f"wrote {done} noise/latent pairs -> {noise_dir}, {latent_dir}")


if __name__ == "__main__":
    main()
