"""LCM (latent consistency model) scheduler + the training-side DDIM solver.

Specs:
- LCMScheduler: /root/reference/diffusion/lcm_scheduler.py (set_timesteps
  :288-311, boundary scalings :313-319, step :321-411)
- DDIMSolver + boundary scalings used in LCM distillation training:
  /root/reference/train_scripts/train_pixart_lcm.py:65-104

JAX-functional: the whole few-step LCM trajectory compiles to one lax.scan
(all per-step alphas/c_skip/c_out precomputed host-side), matching the
one/2/4-step LCM operating points of the reference app.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule


def scalings_for_boundary_conditions(
    t: np.ndarray, sigma_data: float = 0.5, timestep_scaling: float = 10.0
):
    """c_skip/c_out boundary conditions (train_pixart_lcm.py:65-69 and
    lcm_scheduler.py:313-319 — /0.1 there == *10 scaling here)."""
    ts = t * timestep_scaling
    c_skip = sigma_data**2 / (ts**2 + sigma_data**2)
    c_out = ts / (ts**2 + sigma_data**2) ** 0.5
    return c_skip, c_out


def lcm_inference_timesteps(
    num_inference_steps: int,
    lcm_origin_steps: int = 50,
    num_train_timesteps: int = 1000,
) -> np.ndarray:
    """Spec: LCMScheduler.set_timesteps (:288-311)."""
    c = num_train_timesteps // lcm_origin_steps
    origin = np.arange(1, lcm_origin_steps + 1) * c - 1
    skip = len(origin) // num_inference_steps
    return origin[::-skip][:num_inference_steps].copy()


class LCMScheduler:
    """Few-step LCM sampling over a consistency-distilled PixArt.

    model_fn(x, t_int_vec) -> eps prediction [B, ..., C] (epsilon param).
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        betas: Optional[np.ndarray] = None,
        set_alpha_to_one: bool = True,
    ):
        if betas is None:
            betas = named_beta_schedule(
                "linear" if beta_schedule in ("linear", "scaled_linear") else beta_schedule,
                num_train_timesteps,
            )
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else self.alphas_cumprod[0]
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type

    def _pred_x0(self, sample, model_output, alpha_prod_t):
        beta_prod_t = 1.0 - alpha_prod_t
        if self.prediction_type == "epsilon":
            return (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        if self.prediction_type == "sample":
            return model_output
        if self.prediction_type == "v_prediction":
            return alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
        raise ValueError(self.prediction_type)

    def sample(
        self,
        model_fn: Callable,
        shape,
        rng: jax.Array,
        num_inference_steps: int = 4,
        lcm_origin_steps: int = 50,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full LCM trajectory; spec step() :321-411 (epsilon branch).

        NOTE the LCM quirk: the initial latent is PURE noise (not scaled), and
        each step re-noises the denoised estimate to the next timestep.
        """
        timesteps = lcm_inference_timesteps(
            num_inference_steps, lcm_origin_steps, self.num_train_timesteps
        )
        rng, init_rng = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(init_rng, shape)
        denoised = x
        step_rngs = jax.random.split(rng, len(timesteps))

        for i, t in enumerate(timesteps):
            alpha_prod_t = float(self.alphas_cumprod[t])
            c_skip, c_out = scalings_for_boundary_conditions(np.float64(t))
            t_vec = jnp.full((shape[0],), float(t), dtype=jnp.float32)
            eps = model_fn(x, t_vec)
            pred_x0 = self._pred_x0(x, eps, alpha_prod_t)
            denoised = float(c_out) * pred_x0 + float(c_skip) * x
            if len(timesteps) > 1 and i < len(timesteps) - 1:
                prev_t = int(timesteps[i + 1])
                alpha_prev = float(self.alphas_cumprod[prev_t])
                z = jax.random.normal(step_rngs[i], shape, x.dtype)
                x = alpha_prev**0.5 * denoised + (1 - alpha_prev) ** 0.5 * z
        return denoised


class DDIMSolver:
    """Teacher-side deterministic DDIM stepper for LCM distillation.

    Spec: train_pixart_lcm.py:77-104 — ddim_timesteps on the origin grid,
    step from t to its predecessor using predicted x0 and eps.
    """

    def __init__(
        self,
        alpha_cumprods: np.ndarray,
        timesteps: int = 1000,
        ddim_timesteps: int = 50,
    ):
        step_ratio = timesteps // ddim_timesteps
        self.ddim_timesteps = (
            (np.arange(1, ddim_timesteps + 1) * step_ratio) - 1
        ).astype(np.int64)
        self.ddim_alpha_cumprods = alpha_cumprods[self.ddim_timesteps]
        self.ddim_alpha_cumprods_prev = np.concatenate(
            [alpha_cumprods[:1], alpha_cumprods[self.ddim_timesteps[:-1]]]
        )

    def ddim_step(
        self, pred_x0: jnp.ndarray, pred_noise: jnp.ndarray, timestep_index: jnp.ndarray
    ) -> jnp.ndarray:
        acp_prev = jnp.take(
            jnp.asarray(self.ddim_alpha_cumprods_prev, jnp.float32), timestep_index
        ).reshape(-1, *((1,) * (pred_x0.ndim - 1)))
        return acp_prev**0.5 * pred_x0 + (1 - acp_prev) ** 0.5 * pred_noise
