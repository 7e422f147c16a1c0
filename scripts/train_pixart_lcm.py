#!/usr/bin/env python
"""LCM distillation training CLI.

Spec: /root/reference/train_scripts/train_pixart_lcm.py. Loads a pretrained
teacher, initialises the student from it, and runs the consistency
distillation loop (pixart_sigma_tpu.training.lcm_trainer).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--teacher", required=True, help="pretrained .pth/safetensors")
    p.add_argument("--max-steps", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.diffusion import IDDPM
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.training import TrainState, build_lr_schedule, build_optimizer
    from pixart_sigma_tpu.training.lcm_trainer import make_lcm_train_step
    from pixart_sigma_tpu.training.trainer import Trainer, build_dataset
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache
    from pixart_sigma_tpu.utils.logging import get_logger

    enable_compilation_cache()
    config = read_config(args.config)
    if args.work_dir:
        config.work_dir = args.work_dir
    os.makedirs(config.work_dir, exist_ok=True)
    logger = get_logger(work_dir=config.work_dir)

    model = build_model_from_config(config)
    teacher_params = ckpt_io.load_checkpoint(args.teacher, model.cfg)
    student_params = jax.tree_util.tree_map(jnp.copy, teacher_params)

    diffusion = IDDPM(
        timestep_respacing=[config.train_sampling_steps], learn_sigma=True
    )
    opt_cfg = dict(config.optimizer)
    schedule = build_lr_schedule(
        config.lr_schedule, opt_cfg.pop("lr"),
        num_training_steps=(args.max_steps or 100_000),
        **config.get("lr_schedule_args", {}),
    )
    tx = build_optimizer(
        name=opt_cfg.pop("type"), learning_rate=schedule,
        grad_clip_norm=config.get("gradient_clip"), **opt_cfg,
    )
    state = TrainState.create(params=student_params, tx=tx, ema=True)
    step_fn = make_lcm_train_step(
        model, diffusion,
        num_ddim_timesteps=config.num_ddim_timesteps,
        cfg_scale=config.get("cfg_scale", 4.5),
        loss_type=config.loss_type,
        huber_c=config.huber_c,
        ema_decay=config.ema_decay,
    )

    # uncond embedding = the model's learned null caption
    L = model.cfg.model_max_length

    trainer_helper = Trainer.__new__(Trainer)  # reuse data plumbing only
    trainer_helper.config = config
    loader_ds = build_dataset(config)
    from pixart_sigma_tpu.training.trainer import _SimpleBatchSampler
    from pixart_sigma_tpu.data import DataLoader

    sampler = _SimpleBatchSampler(len(loader_ds), config.train_batch_size, config.seed)
    loader = DataLoader(loader_ds, sampler, num_workers=config.get("num_workers", 4))

    rng = jax.random.PRNGKey(config.seed)
    step = 0
    for epoch in range(config.num_epochs):
        for batch in loader:
            B = batch["latents"].shape[0]
            uncond = jnp.broadcast_to(
                state.params["y_embedder"]["y_embedding"][None],
                (B, L, model.cfg.caption_channels),
            ).astype(jnp.float32)
            dev_batch = {
                "latents": jnp.asarray(batch["latents"]) * config.scale_factor,
                "y": jnp.asarray(batch["y"]),
                "y_mask": jnp.asarray(batch["y_mask"]),
            }
            state, metrics = step_fn(state, teacher_params, uncond, dev_batch, rng)
            step += 1
            if step % config.log_interval == 0:
                logger.info(f"step {step}: loss={float(metrics['loss']):.4f}")
            if step % config.save_model_steps == 0:
                ckpt_io.save_train_state(
                    os.path.join(config.work_dir, "checkpoints"), state, step
                )
            if args.max_steps and step >= args.max_steps:
                return


if __name__ == "__main__":
    main()
