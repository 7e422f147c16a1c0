#!/usr/bin/env python
"""DMD one-step distillation training CLI.

Spec: /root/reference/train_scripts/train_pixart_dmd.py +
scripts/run_pixart_dmd.py. Three transformers (student/real/fake), dual
optimizers, alternating generator / fake-score updates.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="DMD triplet dataset root")
    p.add_argument("--teacher", required=True,
                   help="pretrained .pth/safetensors/orbax dir")
    p.add_argument("--config", default=None,
                   help="model config (else PixArtMS_XL_2 at --image-size)")
    p.add_argument("--work-dir", default="output/dmd")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--max-length", type=int, default=120)
    p.add_argument("--caption-dir", default="caption_features",
                   help="caption .npz dir under data-root")
    p.add_argument("--sample-nums", type=int, default=0,
                   help=">0: train on the first N items only (matching a "
                        "partial generate_dmd_data.py run)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--optimizer", default="came", choices=["came", "adamw"],
                   help="came (factored 2nd moments) is the 16 GB-chip "
                        "default: two adamw states for two 0.6B models cost "
                        "9.6 GB fp32 and OOM next to the third model")
    p.add_argument("--teacher-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="the frozen real-score model is inference-only; "
                        "bf16 halves its 2.4 GB residency")
    p.add_argument("--start-ts", type=int, default=400)
    p.add_argument("--cfg", type=float, default=4.5)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--save-steps", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pixart_sigma_tpu.data import DataLoader
    from pixart_sigma_tpu.data.dmd_dataset import DMDDataset
    from pixart_sigma_tpu.diffusion import IDDPM
    from pixart_sigma_tpu.models.pixart import PixArtMS_XL_2
    from pixart_sigma_tpu.training.dmd import make_dmd_train_steps
    from pixart_sigma_tpu.training.trainer import _SimpleBatchSampler
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache
    from pixart_sigma_tpu.utils.logging import get_logger

    enable_compilation_cache()
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_logger(work_dir=args.work_dir)

    if args.config:
        from pixart_sigma_tpu.config import read_config
        from pixart_sigma_tpu.models.builder import build_model_from_config

        config = read_config(args.config)
        model = build_model_from_config(config)
        args.max_length = model.cfg.model_max_length
    else:
        pe = {256: 0.5, 512: 1.0, 1024: 2.0}[args.image_size]
        # remat is mandatory at 0.6B scale: without it the gen step's saved
        # attention probs alone are 1.75 GB x layers and the program needs
        # 18.3 GB (measured); with it the full 3-model step fits in 16 GB
        # at 0.38 s/step (512px, B=2)
        model = PixArtMS_XL_2(
            input_size=args.image_size // 8, pe_interpolation=pe,
            model_max_length=args.max_length, grad_checkpointing=True,
        )
    teacher = ckpt_io.load_checkpoint(args.teacher, model.cfg)
    gen_params = jax.tree_util.tree_map(jnp.copy, teacher)
    fake_params = jax.tree_util.tree_map(jnp.copy, teacher)
    if args.teacher_dtype == "bfloat16":
        teacher = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), teacher
        )

    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True)
    if args.optimizer == "came":
        from pixart_sigma_tpu.training.optim import build_optimizer

        gen_tx = build_optimizer(name="came", learning_rate=args.lr)
        fake_tx = build_optimizer(name="came", learning_rate=args.lr)
    else:
        gen_tx = optax.adamw(args.lr)
        fake_tx = optax.adamw(args.lr)
    gen_step, fake_step, _ = make_dmd_train_steps(
        model, diffusion, start_ts=args.start_ts, cfg_scale=args.cfg,
        generator_tx=gen_tx, fake_tx=fake_tx,
    )
    gen_opt = gen_tx.init(gen_params)
    fake_opt = fake_tx.init(fake_params)

    ds = DMDDataset(args.data_root, max_length=args.max_length,
                    caption_dir=args.caption_dir)
    if args.sample_nums:
        ds.meta = ds.meta[: args.sample_nums]
    sampler = _SimpleBatchSampler(len(ds), args.batch_size)
    loader = DataLoader(ds, sampler)
    L = args.max_length
    step = 0
    rng = jax.random.PRNGKey(0)
    while step < args.max_steps:
        for batch in loader:
            B = batch["init_noise"].shape[0]
            uncond = jnp.broadcast_to(
                gen_params["y_embedder"]["y_embedding"][None],
                (B, L, model.cfg.caption_channels),
            ).astype(jnp.float32)
            dev = {
                "init_noise": jnp.asarray(batch["init_noise"]),
                "base_latent": jnp.asarray(batch["base_latent"]),
                "y": jnp.asarray(batch["y"]),
                "y_mask": jnp.asarray(batch["y_mask"]),
                "uncond_y": uncond,
            }
            rng, r1, r2 = jax.random.split(rng, 3)
            gen_params, gen_opt, metrics, x0 = gen_step(
                gen_params, gen_opt, teacher, fake_params, dev, r1
            )
            fake_params, fake_opt, fmetrics = fake_step(
                fake_params, fake_opt, x0, dev, r2
            )
            step += 1
            if step % args.log_interval == 0:
                logger.info(
                    f"step {step}: dm={float(metrics['dm_loss']):.4f} "
                    f"sg={float(fmetrics['sg_loss']):.4f}"
                )
            if step % args.save_steps == 0 and jax.process_index() == 0:
                import torch

                from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

                sd = flax_to_torch_state_dict(gen_params, model.cfg)
                torch.save(
                    {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
                    os.path.join(args.work_dir, f"dmd_step_{step}.pth"),
                )
            if step >= args.max_steps:
                break


if __name__ == "__main__":
    main()
