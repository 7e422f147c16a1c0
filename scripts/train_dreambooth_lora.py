#!/usr/bin/env python
"""DreamBooth-LoRA subject-driven finetuning CLI.

Spec: /root/reference/train_scripts/train_dreambooth_lora.py — a handful of
instance images of one subject (plus optional prior-preservation class
images), LoRA on the DiT, loss = instance MSE + prior_loss_weight * class
MSE. The reference precomputes T5/VAE features up front (:65-246); here the
same happens in one jitted encode pass when --vae-path/--t5-path are given,
or latents/embeddings are read straight from .npy/.npz files.

Data layout: --instance-dir (and optionally --class-dir) containing either
images (.png/.jpg; requires --vae-path) or precomputed latents (.npy,
[H/8, W/8, 4]). Prompts are encoded with --t5-path, or loaded from
--prompt-embeds (npz: y_instance, mask_instance[, y_class, mask_class]).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default="output/dreambooth")
    p.add_argument("--base", required=True, help="pretrained .pth/safetensors")
    p.add_argument("--instance-dir", required=True)
    p.add_argument("--instance-prompt", default="a photo of sks subject")
    p.add_argument("--class-dir", default=None,
                   help="prior-preservation class images/latents")
    p.add_argument("--class-prompt", default="a photo of a subject")
    p.add_argument("--prior-loss-weight", type=float, default=1.0)
    p.add_argument("--prompt-embeds", default=None,
                   help="npz with y_instance/mask_instance[,y_class,mask_class]")
    p.add_argument("--t5-path", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--use-dora", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=400)
    return p.parse_args()


def _load_latents(path_dir, vae, vae_params, scale_factor, image_size):
    """Latents from a directory of .npy latents or images (VAE-encoded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    npys = sorted(glob.glob(os.path.join(path_dir, "*.npy")))
    if npys:
        return np.stack([np.load(f) for f in npys])
    imgs = sorted(
        f for ext in ("*.png", "*.jpg", "*.jpeg")
        for f in glob.glob(os.path.join(path_dir, ext))
    )
    if not imgs:
        raise FileNotFoundError(f"no .npy latents or images in {path_dir}")
    if vae is None:
        raise ValueError(
            f"{path_dir} holds images but no --vae-path was given"
        )
    from PIL import Image

    from pixart_sigma_tpu.models.vae import AutoencoderKL

    arr = []
    for f in imgs:
        im = Image.open(f).convert("RGB").resize((image_size, image_size))
        arr.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    x = jnp.asarray(np.stack(arr))

    def encode(p, xx, r):
        mean, logvar = vae.apply(p, xx, method=AutoencoderKL.encode)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            r, mean.shape, mean.dtype
        )

    z = jax.jit(encode)(vae_params, x, jax.random.PRNGKey(0))
    return np.asarray(z)


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.diffusion import IDDPM
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.training.dreambooth import make_dreambooth_step
    from pixart_sigma_tpu.training.lora import (
        count_lora_params,
        init_lora_params,
        merge_lora,
    )
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache
    from pixart_sigma_tpu.utils.logging import get_logger

    enable_compilation_cache()
    config = read_config(args.config)
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_logger(work_dir=args.work_dir)

    model = build_model_from_config(config)
    base_params = ckpt_io.load_checkpoint(args.base, model.cfg)

    vae = vae_params = None
    if args.vae_path:
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
                load_safetensors_state_dict(args.vae_path), vae_cfg
            )
        }

    image_size = config.image_size
    inst = _load_latents(
        args.instance_dir, vae, vae_params, config.scale_factor, image_size
    ) * config.scale_factor
    cls = None
    with_prior = args.class_dir is not None
    if with_prior:
        cls = _load_latents(
            args.class_dir, vae, vae_params, config.scale_factor, image_size
        ) * config.scale_factor

    # prompt embeddings: one per branch, broadcast over the batch
    if args.prompt_embeds:
        z = np.load(args.prompt_embeds)
        y_inst, m_inst = z["y_instance"], z["mask_instance"]
        y_cls = z["y_class"] if "y_class" in z else None
        m_cls = z["mask_class"] if "mask_class" in z else None
    elif args.t5_path:
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(
            args.t5_path, model_max_length=config.model_max_length
        )
        y_inst, m_inst = t5.get_text_embeddings([args.instance_prompt])
        y_inst, m_inst = np.asarray(y_inst[0]), np.asarray(m_inst[0])
        if with_prior:
            y_cls, m_cls = t5.get_text_embeddings([args.class_prompt])
            y_cls, m_cls = np.asarray(y_cls[0]), np.asarray(m_cls[0])
    else:
        raise ValueError("need --prompt-embeds or --t5-path")
    if with_prior and y_cls is None:
        raise ValueError("--class-dir given but no class prompt embedding")
    if with_prior and m_cls is None:
        raise ValueError(
            "--class-dir given but the prompt-embeds npz is missing "
            "'mask_class' (found 'y_class' without its attention mask)"
        )

    rank = args.rank or config.get("lora_rank", 4)
    lora = init_lora_params(
        base_params, rank=rank, rng=jax.random.PRNGKey(config.seed),
        use_dora=args.use_dora,
    )
    logger.info(
        f"DreamBooth LoRA rank {rank}: {count_lora_params(lora) / 1e6:.2f}M "
        f"params; {len(inst)} instance"
        + (f" + {len(cls)} class latents" if with_prior else " latents")
    )

    diffusion = IDDPM(
        timestep_respacing=[config.train_sampling_steps], learn_sigma=True,
        rescale_learned_sigmas=True,
    )
    tx = optax.adamw(args.lr)
    opt_state = tx.init(lora)
    step_fn = make_dreambooth_step(
        model, diffusion, base_params, tx,
        with_prior_preservation=with_prior,
        prior_loss_weight=args.prior_loss_weight,
    )

    bs = args.batch_size or config.get("train_batch_size", 2)
    rng = np.random.RandomState(config.seed)
    jrng = jax.random.PRNGKey(config.seed)
    for step in range(args.max_steps):
        pick_i = rng.randint(0, len(inst), size=bs)
        parts = [inst[pick_i]]
        ys = [np.broadcast_to(y_inst, (bs, *y_inst.shape))]
        ms = [np.broadcast_to(m_inst, (bs, *m_inst.shape))]
        if with_prior:
            pick_c = rng.randint(0, len(cls), size=bs)
            parts.append(cls[pick_c])
            ys.append(np.broadcast_to(y_cls, (bs, *y_cls.shape)))
            ms.append(np.broadcast_to(m_cls, (bs, *m_cls.shape)))
        batch = {
            "latents": jnp.asarray(np.concatenate(parts)),
            "y": jnp.asarray(np.concatenate(ys)),
            "y_mask": jnp.asarray(np.concatenate(ms), jnp.int32),
        }
        lora, opt_state, metrics = step_fn(
            lora, opt_state, batch, jax.random.fold_in(jrng, step)
        )
        if (step + 1) % config.get("log_interval", 50) == 0:
            logger.info(
                f"step {step + 1}: "
                + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            )

    if jax.process_index() == 0:
        import torch

        from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

        merged = merge_lora(base_params, lora)
        sd = flax_to_torch_state_dict(merged, model.cfg)
        out = os.path.join(args.work_dir, "dreambooth_lora_merged.pth")
        torch.save(
            {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
            out,
        )
        logger.info(f"merged weights -> {out}")


if __name__ == "__main__":
    main()
