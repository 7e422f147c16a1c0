#!/usr/bin/env python
"""LoRA / DoRA finetuning CLI.

Spec: /root/reference/train_scripts/train_pixart_lora_hf.py (peft LoRA on
attention qkv/out, ff, adaLN linear; --rank/--use_dora/--use_rslora).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default="output/lora")
    p.add_argument("--base", required=True, help="pretrained .pth/safetensors")
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--use-dora", action="store_true")
    p.add_argument("--use-rslora", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--snr-gamma", type=float, default=None,
                   help="Min-SNR-gamma loss rebalancing (try 5.0; reference train_pixart_lora_hf.py:252)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.data import DataLoader
    from pixart_sigma_tpu.diffusion import IDDPM
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.training.lora import (
        count_lora_params,
        init_lora_params,
        make_lora_train_step,
        merge_lora,
    )
    from pixart_sigma_tpu.training.trainer import _SimpleBatchSampler, build_dataset
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache
    from pixart_sigma_tpu.utils.logging import get_logger

    enable_compilation_cache()
    config = read_config(args.config)
    config.work_dir = args.work_dir
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_logger(work_dir=args.work_dir)

    model = build_model_from_config(config)
    base_params = ckpt_io.load_checkpoint(args.base, model.cfg)
    rank = args.rank or config.get("lora_rank", 4)
    lora = init_lora_params(
        base_params, rank=rank, rng=jax.random.PRNGKey(config.seed),
        use_dora=args.use_dora,
    )
    logger.info(f"LoRA rank {rank}: {count_lora_params(lora) / 1e6:.2f}M params")

    diffusion = IDDPM(
        timestep_respacing=[config.train_sampling_steps], learn_sigma=True,
        rescale_learned_sigmas=True,
    )
    tx = optax.adamw(args.lr)
    opt_state = tx.init(lora)
    step_fn = make_lora_train_step(
        model, diffusion, base_params, tx, snr_gamma=args.snr_gamma
    )

    ds = build_dataset(config)
    sampler = _SimpleBatchSampler(len(ds), config.train_batch_size, config.seed)
    loader = DataLoader(ds, sampler, num_workers=config.get("num_workers", 4))
    rng = jax.random.PRNGKey(config.seed)
    step = 0
    for epoch in range(config.num_epochs):
        for batch in loader:
            dev = {
                "latents": jnp.asarray(batch["latents"]) * config.scale_factor,
                "y": jnp.asarray(batch["y"]),
                "y_mask": jnp.asarray(batch["y_mask"]),
            }
            lora, opt_state, loss = step_fn(
                lora, opt_state, dev, jax.random.fold_in(rng, step)
            )
            step += 1
            if step % config.log_interval == 0:
                logger.info(f"step {step}: loss={float(loss):.4f}")
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break

    # export merged weights as .pth for interop
    if jax.process_index() == 0:
        import torch

        from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

        merged = merge_lora(base_params, lora)
        sd = flax_to_torch_state_dict(merged, model.cfg)
        out = os.path.join(args.work_dir, "lora_merged.pth")
        torch.save(
            {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
            out,
        )
        logger.info(f"merged LoRA weights -> {out}")


if __name__ == "__main__":
    main()
