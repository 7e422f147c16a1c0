#!/usr/bin/env python
"""Train an AutoencoderKL (KL-VAE) from scratch on an image folder.

The reference always consumes a *pretrained* diffusers VAE
(/root/reference/train_scripts/train.py:352-354); it has no VAE trainer. This
script closes that gap for air-gapped / from-scratch runs: standard KL-VAE
objective (L2 reconstruction + KL regularizer, the non-adversarial part of
latent-diffusion first-stage training), Adam, bf16-friendly, jitted on TPU.

The result feeds tools/extract_features.py (--vae-flax) and the Trainer /
inference pipeline exactly like a converted diffusers VAE would.

Usage:
  python scripts/train_vae.py --data-root /tmp/toy/InternImgs --resolution 128 \
      --preset small --steps 3000 --out /tmp/toy_vae
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PRESETS = {
    # downsample x8 in every preset (4 levels); channels scale capacity
    "small": dict(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                  norm_num_groups=8),
    "base": dict(block_out_channels=(64, 128, 256, 256), layers_per_block=2,
                 norm_num_groups=32),
    "sdxl": dict(),  # full-size architecture (VAEConfig defaults)
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="folder of images")
    p.add_argument("--out", required=True, help="output dir for params+config")
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--preset", choices=sorted(PRESETS), default="small")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=100)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization
    from PIL import Image

    from pixart_sigma_tpu.models.vae import AutoencoderKL, VAEConfig
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache
    from pixart_sigma_tpu.utils.logging import get_logger

    enable_compilation_cache()
    os.makedirs(args.out, exist_ok=True)
    logger = get_logger(work_dir=args.out)

    files = sorted(
        f for ext in ("*.png", "*.jpg", "*.jpeg")
        for f in glob.glob(os.path.join(args.data_root, ext))
    )
    if not files:
        raise FileNotFoundError(f"no images under {args.data_root}")
    logger.info(f"{len(files)} images; resolution {args.resolution}")

    cfg = VAEConfig(**PRESETS[args.preset])
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(args.seed)
    params = vae.init(
        rng, jnp.zeros((1, args.resolution, args.resolution, 3)), rng
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"VAE preset={args.preset}: {n_params/1e6:.2f}M params")

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            recon, mean, logvar = vae.apply(p, batch, key)
            rec = jnp.mean(jnp.square(recon - batch))
            kl = 0.5 * jnp.mean(
                jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar
            )
            return rec + args.kl_weight * kl, (rec, kl)

        (loss, (rec, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rec, kl

    # simple in-memory pipeline: toy folders fit in RAM at these sizes
    def load(f):
        with Image.open(f) as im:
            im = im.convert("RGB").resize((args.resolution, args.resolution))
            return np.asarray(im, np.float32) / 127.5 - 1.0

    data = np.stack([load(f) for f in files])
    logger.info(f"data in memory: {data.nbytes/1e6:.0f} MB")

    np_rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = np_rng.integers(0, len(data), size=args.batch)
        batch = jnp.asarray(data[idx])
        rng, key = jax.random.split(rng)
        params, opt_state, loss, rec, kl = train_step(
            params, opt_state, batch, key
        )
        if step % args.log_interval == 0 or step == 1:
            # device_get = the only sound completion barrier on tunneled TPU
            loss, rec, kl = jax.device_get((loss, rec, kl))
            dt = time.time() - t0
            logger.info(
                f"step {step}/{args.steps} loss {loss:.5f} rec {rec:.5f} "
                f"kl {kl:.3f} ({step * args.batch / dt:.1f} img/s)"
            )

    with open(os.path.join(args.out, "vae_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(args.out, "vae_config.json"), "w") as f:
        json.dump(
            dict(
                in_channels=cfg.in_channels,
                latent_channels=cfg.latent_channels,
                block_out_channels=list(cfg.block_out_channels),
                layers_per_block=cfg.layers_per_block,
                norm_num_groups=cfg.norm_num_groups,
                scaling_factor=cfg.scaling_factor,
            ),
            f,
        )
    logger.info(f"saved -> {args.out}/vae_params.msgpack + vae_config.json")


if __name__ == "__main__":
    main()
