"""Latent-consistency (LCM) distillation training step.

Spec: /root/reference/train_scripts/train_pixart_lcm.py:176-364 — online
student + frozen teacher + EMA target:
  1. t_{n+k} = ddim_timesteps[i], t_n = t_{n+k} - topk (clamped at 0)
  2. student eps at t_{n+k} -> pred_x0; model_pred = c_skip*x_t + c_out*x0
  3. teacher eps at t_{n+k} cond & uncond; LCM-paper CFG
     (pred = cond + w*(cond - uncond)); DDIM step -> x_prev
  4. EMA target at t_n on x_prev (no added noise) -> target consistency value
  5. huber / l2 loss; EMA update with ema_decay (0.95)

One jitted program; teacher/EMA forwards run under stop_gradient.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.diffusion.gaussian import GaussianDiffusion
from pixart_sigma_tpu.diffusion.lcm import (
    DDIMSolver,
    scalings_for_boundary_conditions,
)
from pixart_sigma_tpu.training.train_state import TrainState


def make_lcm_train_step(
    model,
    diffusion: GaussianDiffusion,
    *,
    num_ddim_timesteps: int = 50,
    cfg_scale: float = 4.5,
    loss_type: str = "huber",
    huber_c: float = 0.001,
    ema_decay: float = 0.95,
) -> Callable:
    """train_step(state, teacher_params, uncond_y, batch, rng) -> (state, metrics).

    state.ema_params plays the TARGET network role (updated with ema_decay,
    not the usual 0.9999). batch: latents/y/y_mask (+micro-cond fields).
    """
    T = diffusion.num_timesteps
    acp = np.asarray(diffusion.coef.alphas_cumprod, np.float64)
    solver = DDIMSolver(acp, T, num_ddim_timesteps)
    topk = T // num_ddim_timesteps
    ddim_ts = jnp.asarray(solver.ddim_timesteps, jnp.int32)

    sqrt_acp = jnp.asarray(np.sqrt(acp), jnp.float32)
    sqrt_1macp = jnp.asarray(np.sqrt(1 - acp), jnp.float32)

    def eps_and_x0(params, x_t, t, y, batch, drop_rng=None):
        kwargs = {}
        if model.cfg.micro_condition:
            kwargs = dict(
                img_hw=batch["img_hw"], aspect_ratio=batch["aspect_ratio"]
            )
        rngs = {"caption_drop": drop_rng} if drop_rng is not None else None
        out = model.apply(
            {"params": params}, x_t, t.astype(jnp.float32), y,
            batch.get("y_mask"), train=drop_rng is not None, rngs=rngs, **kwargs
        )
        eps = out[..., : model.cfg.in_channels]
        nd = x_t.ndim
        a = jnp.take(sqrt_acp, t).reshape(-1, *((1,) * (nd - 1)))
        s = jnp.take(sqrt_1macp, t).reshape(-1, *((1,) * (nd - 1)))
        x0 = (x_t - s * eps) / a
        return eps, x0

    def loss_fn(params, teacher_params, batch, index, noise, uncond_y, ema_params):
        latents = batch["latents"]
        nd = latents.ndim
        B = latents.shape[0]
        start_t = jnp.take(ddim_ts, index)  # t_{n+k}
        t_n = jnp.maximum(start_t - topk, 0)

        expand = lambda v: v.reshape(-1, *((1,) * (nd - 1)))
        c_skip_s, c_out_s = scalings_for_boundary_conditions(
            start_t.astype(jnp.float32)
        )
        c_skip, c_out = scalings_for_boundary_conditions(t_n.astype(jnp.float32))
        c_skip_s, c_out_s, c_skip, c_out = map(
            expand, (c_skip_s, c_out_s, c_skip, c_out)
        )
        w = cfg_scale

        x_t = diffusion.q_sample(latents, start_t, noise)
        # student
        _, pred_x0 = eps_and_x0(params, x_t, start_t, batch["y"], batch)
        model_pred = c_skip_s * x_t + c_out_s * pred_x0

        # teacher (frozen), cond + uncond, LCM-paper CFG
        teacher_params = jax.lax.stop_gradient(teacher_params)
        t_eps_c, t_x0_c = eps_and_x0(teacher_params, x_t, start_t, batch["y"], batch)
        t_eps_u, t_x0_u = eps_and_x0(teacher_params, x_t, start_t, uncond_y, batch)
        pred_x0_t = t_x0_c + w * (t_x0_c - t_x0_u)
        pred_eps_t = t_eps_c + w * (t_eps_c - t_eps_u)
        x_prev = jax.lax.stop_gradient(
            solver.ddim_step(pred_x0_t, pred_eps_t, index)
        )

        # EMA target at t_n, no extra noise (skip_noise=True path)
        _, target_x0 = eps_and_x0(ema_params, x_prev, t_n, batch["y"], batch)
        target = jax.lax.stop_gradient(c_skip * x_prev + c_out * target_x0)

        if loss_type == "l2":
            loss = jnp.mean((model_pred - target) ** 2)
        else:  # huber (pseudo-huber, spec :294-298)
            loss = jnp.mean(
                jnp.sqrt((model_pred - target) ** 2 + huber_c**2) - huber_c
            )
        return loss

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, teacher_params, uncond_y, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        i_rng, n_rng = jax.random.split(rng, 2)
        B = batch["latents"].shape[0]
        index = jax.random.randint(i_rng, (B,), 0, num_ddim_timesteps)
        noise = jax.random.normal(n_rng, batch["latents"].shape)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, batch, index, noise, uncond_y,
            state.ema_params,
        )
        # the EMA target network uses ema_decay (0.95, spec :301-309) — one
        # EMA computation, overriding the state's default rate
        new_state = state.apply_gradients(grads, ema_rate=ema_decay)
        return new_state, {"loss": loss}

    return train_step
