"""DMD (distribution matching distillation) one-step generator training.

Spec: /root/reference/train_scripts/train_pixart_dmd.py:471-699 +
scripts/DMD/transformer_train/generate.py:22-40. Three 0.6B transformers:
the one-step STUDENT generator, a frozen REAL-score teacher, and a trained
FAKE-score network; per step:

  1. student: x0_student = eps_to_x0(model(noise, t=start_ts), noise)  (1 NFE)
  2. DM loss: renoise x0_student at t~U[1, start_ts); real score with CFG
     (score = -eps), fake score; coeff = (fake - real) * sqrt(beta/alpha);
     normalised gradient trick -> mse(x0, stopgrad(x0 - w*coeff))
  3. optional LPIPS regression of the decoded x0 against the teacher's
     base image (via a small VAE decoder)
  4. fake-score network trained with the standard eps-MSE on x0_student

Two jitted steps (generator step, fake-score step) with separate optimizers,
exactly mirroring the reference's alternating updates.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixart_sigma_tpu.diffusion.gaussian import GaussianDiffusion


def make_dmd_train_steps(
    model,
    diffusion: GaussianDiffusion,
    *,
    start_ts: int = 400,
    cfg_scale: float = 4.5,
    regression_weight: float = 0.25,
    lpips_fn: Optional[Callable] = None,  # (img, base_img) -> [B] distances
    decode_fn: Optional[Callable] = None,  # latents -> images in [-1, 1]
    generator_tx: Optional[optax.GradientTransformation] = None,
    fake_tx: Optional[optax.GradientTransformation] = None,
):
    """Returns (generator_step, fake_step, one_step_generate)."""
    acp = jnp.asarray(diffusion.coef.alphas_cumprod, jnp.float32)

    def eps_fn(params, x_t, t, y, y_mask):
        out = model.apply(
            {"params": params}, x_t, t.astype(jnp.float32), y, y_mask
        )
        return out[..., : model.cfg.in_channels]

    def eps_to_x0(eps, x_t, t):
        nd = x_t.ndim
        a = jnp.take(acp, t).reshape(-1, *((1,) * (nd - 1)))
        return (x_t - (1 - a) ** 0.5 * eps) / a**0.5

    def one_step_generate(params, noise, y, y_mask):
        """The 1-NFE generator at t=start_ts (app_pixart_dmd.py:193-204)."""
        B = noise.shape[0]
        t = jnp.full((B,), start_ts, jnp.int32)
        eps = eps_fn(params, noise, t, y, y_mask)
        return eps_to_x0(eps, noise, t)

    def generator_loss(params, real_params, fake_params, batch, rng):
        noise_rng, t_rng = jax.random.split(rng)
        y, y_mask = batch["y"], batch.get("y_mask")
        uncond_y = batch["uncond_y"]
        init_noise = batch["init_noise"]
        B = init_noise.shape[0]

        x0 = one_step_generate(params, init_noise, y, y_mask)

        t = jax.random.randint(t_rng, (B,), 1, start_ts)
        noise = jax.random.normal(noise_rng, x0.shape)
        x_t = diffusion.q_sample(x0, t, noise)

        # real score with CFG (score = -eps), fake score — the whole score
        # branch is constant w.r.t. the student (reference computes it under
        # torch.no_grad, train_pixart_dmd.py:519-551)
        x_t_sg = jax.lax.stop_gradient(x_t)
        t2 = jnp.concatenate([t, t])
        x2 = jnp.concatenate([x_t_sg, x_t_sg])
        y2 = jnp.concatenate([uncond_y, y])
        m2 = jnp.concatenate([y_mask, y_mask]) if y_mask is not None else None
        real_eps = eps_fn(jax.lax.stop_gradient(real_params), x2, t2, y2, m2)
        score_u, score_c = jnp.split(-real_eps, 2, axis=0)
        score_real = score_u + cfg_scale * (score_c - score_u)
        fake_eps = eps_fn(
            jax.lax.stop_gradient(fake_params), x_t_sg, t, y, y_mask
        )
        score_fake = -fake_eps

        nd = x0.ndim
        a = jnp.take(acp, t).reshape(-1, *((1,) * (nd - 1)))
        b = 1.0 - a
        coeff = (score_fake - score_real) * b**0.5 / a**0.5
        pred_latents = (x_t + b**0.5 * score_real) / a**0.5
        weight = 1.0 / (
            jnp.mean(
                jnp.abs(x0 - pred_latents), axis=tuple(range(1, nd)), keepdims=True
            )
            + 1e-5
        )
        weight = jax.lax.stop_gradient(weight)
        target = jax.lax.stop_gradient(x0 - weight * coeff)
        dm_loss = jnp.mean((x0 - target) ** 2)

        metrics = {"dm_loss": dm_loss}
        loss = dm_loss
        if lpips_fn is not None and decode_fn is not None and "base_latent" in batch:
            rb = max(B // 2, 1)
            imgs = jnp.clip(decode_fn(x0[:rb]), -1.0, 1.0)
            base = jnp.clip(decode_fn(batch["base_latent"][:rb]), -1.0, 1.0)
            reg = jnp.mean(lpips_fn(imgs, base)) * regression_weight
            metrics["lpips_loss"] = reg
            loss = loss + reg
        metrics["loss"] = loss
        return loss, (metrics, jax.lax.stop_gradient(x0))

    @partial(jax.jit, donate_argnums=(1,))
    def generator_step(params, opt_state, real_params, fake_params, batch, rng):
        (loss, (metrics, x0)), grads = jax.value_and_grad(
            generator_loss, has_aux=True
        )(params, real_params, fake_params, batch, rng)
        updates, opt_state = generator_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, x0

    def fake_loss(fake_params, x0, batch, rng):
        noise_rng, t_rng = jax.random.split(rng)
        B = x0.shape[0]
        t = jax.random.randint(t_rng, (B,), 1, start_ts)
        noise = jax.random.normal(noise_rng, x0.shape)
        x_t = diffusion.q_sample(x0, t, noise)
        pred = eps_fn(fake_params, x_t, t, batch["y"], batch.get("y_mask"))
        return jnp.mean((pred - noise) ** 2)

    @partial(jax.jit, donate_argnums=(1,))
    def fake_step(fake_params, fake_opt_state, x0, batch, rng):
        loss, grads = jax.value_and_grad(fake_loss)(fake_params, x0, batch, rng)
        updates, fake_opt_state = fake_tx.update(grads, fake_opt_state, fake_params)
        fake_params = optax.apply_updates(fake_params, updates)
        return fake_params, fake_opt_state, {"sg_loss": loss}

    return generator_step, fake_step, one_step_generate
