"""DreamBooth(-LoRA) subject-driven finetuning.

Spec: /root/reference/train_scripts/train_dreambooth_lora.py — instance
images of one subject + optional prior-preservation class images; LoRA on
the DiT; loss = instance MSE + prior_loss_weight * class MSE.

Functional: `make_dreambooth_step` wraps the LoRA step with the
prior-preservation split (instance/class concatenated in one batch, like the
reference's collate).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from pixart_sigma_tpu.diffusion.gaussian import GaussianDiffusion
from pixart_sigma_tpu.training.lora import apply_lora


def make_dreambooth_step(
    model,
    diffusion: GaussianDiffusion,
    base_params,
    tx: optax.GradientTransformation,
    *,
    with_prior_preservation: bool = True,
    prior_loss_weight: float = 1.0,
    lora_scale: float = 1.0,
) -> Callable:
    """step(lora, opt_state, batch, rng) -> (lora, opt_state, metrics).

    With prior preservation the batch stacks [instance; class] along B and
    the two halves are weighted separately (reference :470-520 pattern).
    """

    def loss_fn(lora, batch, t, noise):
        merged = apply_lora(base_params, lora, scale=lora_scale)

        def model_fn(x_t, t_in):
            return model.apply(
                {"params": merged}, x_t, t_in, batch["y"], batch.get("y_mask")
            )

        terms = diffusion.training_losses(
            model_fn, batch["latents"], t, noise=noise
        )
        per_sample = terms["loss"]
        if with_prior_preservation:
            half = per_sample.shape[0] // 2
            instance = jnp.mean(per_sample[:half])
            prior = jnp.mean(per_sample[half:])
            loss = instance + prior_loss_weight * prior
            return loss, {"loss": loss, "instance": instance, "prior": prior}
        loss = jnp.mean(per_sample)
        return loss, {"loss": loss}

    @partial(jax.jit, donate_argnums=(1,))
    def step(lora, opt_state, batch, rng):
        t_rng, n_rng = jax.random.split(rng)
        B = batch["latents"].shape[0]
        t = jax.random.randint(t_rng, (B,), 0, diffusion.num_timesteps)
        noise = jax.random.normal(n_rng, batch["latents"].shape)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            lora, batch, t, noise
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, metrics

    return step
