#!/usr/bin/env python
"""Training CLI.

Spec: /root/reference/train_scripts/train.py:244-296 (argparse surface:
config, --work-dir, --load-from, --resume-from, --debug, --max-steps).

Usage:
  python scripts/train.py configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py \
      --work-dir output/run1 [--load-from ckpt.pth] [--resume-from latest] [--debug]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train PixArt on TPU")
    p.add_argument("config", help="python config file")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--load-from", default=None, help=".pth/safetensors weights")
    p.add_argument("--resume-from", default=None, help="orbax dir or 'latest'")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="batch 2, log every step (reference --debug)")
    return p.parse_args()


def main():
    args = parse_args()
    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.parallel.dist import initialize_distributed
    from pixart_sigma_tpu.training.trainer import Trainer
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed()

    config = read_config(args.config)
    if args.work_dir:
        config.work_dir = args.work_dir
    if args.load_from:
        config.load_from = args.load_from
    if args.resume_from:
        config.resume_from = dict(
            checkpoint=args.resume_from, load_ema=False,
            resume_optimizer=True, resume_lr_scheduler=True,
        )
    if args.debug:
        config.train_batch_size = 2
        config.log_interval = 1

    vae = vae_params = t5 = None
    data_cfg = config.get("data", {}) or {}
    # The VAE is needed both for on-the-fly latent encoding
    # (load_vae_feat=False, reference train.py:144-155) and for decoding
    # validation samples to images (reference log_validation, train.py:93-118)
    # — load it whenever a path is configured.
    if config.get("vae_pretrained"):
        vae_path = config.vae_pretrained
        if os.path.isdir(vae_path):
            # dir from scripts/train_vae.py (flax msgpack + config json)
            from pixart_sigma_tpu.models.vae import load_flax_vae

            vae, vae_params = load_flax_vae(vae_path)
        else:
            from pixart_sigma_tpu.models.vae import (
                AutoencoderKL,
                VAEConfig,
                diffusers_vae_to_flax,
            )
            from pixart_sigma_tpu.utils.checkpoint import (
                load_safetensors_state_dict,
            )

            vae_cfg = VAEConfig.sdxl(scaling_factor=config.scale_factor)
            vae = AutoencoderKL(vae_cfg)
            vae_params = {
                "params": diffusers_vae_to_flax(
                    load_safetensors_state_dict(config.vae_pretrained), vae_cfg
                )
            }
    if not data_cfg.get("load_t5_feat", True) and config.get("t5_pretrained"):
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(
            config.t5_pretrained, model_max_length=config.model_max_length
        )

    trainer = Trainer(config, vae=vae, vae_params=vae_params, t5=t5)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
