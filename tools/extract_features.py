#!/usr/bin/env python
"""Precompute T5 caption features and VAE latents for fast training.

Spec: /root/reference/tools/extract_features.py — caption features to .npz
(fp16 feature + int16 mask, :129-203) and VAE posterior [mean, std] concat
to .npy (:259-269), single-scale or multi-scale (per-bucket HW) modes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="InternData root with data_info.json")
    p.add_argument("--json", default="data_info.json")
    p.add_argument("--t5-path", default=None, help="extract caption features")
    p.add_argument("--vae-path", default=None,
                   help="diffusers safetensors VAE: extract latents")
    p.add_argument("--vae-flax", default=None,
                   help="dir from scripts/train_vae.py: extract latents")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--max-length", type=int, default=300)
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    return p.parse_args()


def extract_caption_t5(args, meta):
    from pixart_sigma_tpu.data.aspect import get_chunks
    from pixart_sigma_tpu.models.t5 import T5Embedder

    out_dir = os.path.join(args.root, "caption_features_new")
    os.makedirs(out_dir, exist_ok=True)
    t5 = T5Embedder.from_pretrained(args.t5_path, model_max_length=args.max_length)
    for chunk in get_chunks(meta, args.batch):
        prompts = [m["prompt"] for m in chunk]
        feats, masks = t5.get_text_embeddings(prompts)
        feats = np.asarray(feats, np.float16)
        masks = np.asarray(masks, np.int16)
        for m, f, am in zip(chunk, feats, masks):
            name = m["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0] + ".npz"
            np.savez(
                os.path.join(out_dir, name),
                caption_feature=f[None],
                attention_mask=am[None],
            )
    print(f"caption features -> {out_dir}")


def extract_img_vae(args, meta):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pixart_sigma_tpu.data.aspect import aspect_ratio_table, get_closest_ratio
    from pixart_sigma_tpu.data.transforms import default_train, multiscale_train
    from pixart_sigma_tpu.models.vae import (
        AutoencoderKL,
        VAEConfig,
        diffusers_vae_to_flax,
    )
    from pixart_sigma_tpu.utils.checkpoint import load_safetensors_state_dict

    suffix = "_ms_new" if args.multi_scale else "_new"
    out_dir = os.path.join(
        args.root, f"img_sdxl_vae_features_{args.resolution}resolution{suffix}"
    )
    os.makedirs(out_dir, exist_ok=True)

    if args.vae_flax:
        from pixart_sigma_tpu.models.vae import load_flax_vae

        vae, params = load_flax_vae(args.vae_flax)
    else:
        cfg = VAEConfig.sdxl()
        vae = AutoencoderKL(cfg)
        params = {"params": diffusers_vae_to_flax(
            load_safetensors_state_dict(args.vae_path), cfg)}
    encode = jax.jit(
        lambda x: vae.apply(params, x, method=AutoencoderKL.encode)
    )
    img_root = args.root.replace("InternData", "InternImgs")
    ratios = aspect_ratio_table(args.resolution) if args.multi_scale else None

    # Group by resized HW so each group batches into one dispatch (the
    # tunneled TPU pays per-call latency; batch-1 encode is ~10x slower).
    groups: dict = {}
    for m in meta:
        if args.multi_scale:
            size, _ = get_closest_ratio(m["height"], m["width"], ratios)
            hw = (int(size[0]), int(size[1]))
        else:
            hw = (args.resolution, args.resolution)
        groups.setdefault(hw, []).append(m)

    def flush(batch_arr, batch_meta):
        n = len(batch_meta)
        x = np.stack(batch_arr, axis=0)
        if n < args.batch:  # pad to the jitted batch shape
            x = np.concatenate([x, np.repeat(x[-1:], args.batch - n, 0)], axis=0)
        mean, logvar = encode(jnp.asarray(x))
        mean = np.asarray(mean[:n])
        std = np.exp(0.5 * np.asarray(logvar[:n]))
        for m, mu, sd in zip(batch_meta, mean, std):
            # [mean, std] concat on channel, CHW like the reference (.npy)
            packed = np.concatenate(
                [mu.transpose(2, 0, 1), sd.transpose(2, 0, 1)], axis=0
            ).astype(np.float16)
            name = m["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0] + ".npy"
            np.save(os.path.join(out_dir, name), packed)

    for hw, ms in groups.items():
        batch_arr, batch_meta = [], []
        for m in ms:
            with Image.open(os.path.join(img_root, m["path"])) as im:
                if args.multi_scale:
                    arr = multiscale_train(im, hw)
                else:
                    arr = default_train(im, args.resolution)
            batch_arr.append(np.asarray(arr))
            batch_meta.append(m)
            if len(batch_meta) == args.batch:
                flush(batch_arr, batch_meta)
                batch_arr, batch_meta = [], []
        if batch_meta:
            flush(batch_arr, batch_meta)
    print(f"vae latents -> {out_dir}")


def main():
    args = parse_args()
    with open(os.path.join(args.root, args.json)) as f:
        meta = json.load(f)
    if args.t5_path:
        extract_caption_t5(args, meta)
    if args.vae_path or args.vae_flax:
        extract_img_vae(args, meta)


if __name__ == "__main__":
    main()
