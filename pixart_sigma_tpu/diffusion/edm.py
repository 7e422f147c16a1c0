"""EDM (Karras) Heun sampler — auxiliary/experimental in the reference.

Spec: /root/reference/diffusion/model/edm_sample.py:11-47 (Algorithm 2 of
Karras et al. 2022 with optional churn). `denoise_fn(x, sigma)` returns the
denoised estimate (x0 prediction) at noise level sigma.

Host-side f64 sigma grid; per-step math under jit (unrolled, <=18 steps).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def karras_sigmas(
    num_steps: int, sigma_min: float = 0.002, sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """The rho-spaced sigma grid with the terminal 0 appended."""
    idx = np.arange(num_steps, dtype=np.float64)
    t = (
        sigma_max ** (1 / rho)
        + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    return np.append(t, 0.0)


def edm_sampler(
    denoise_fn: Callable,
    latents: jnp.ndarray,
    rng: jax.Array,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 0.0,
    s_min: float = 0.0,
    s_max: float = float("inf"),
    s_noise: float = 1.0,
) -> jnp.ndarray:
    """Heun (2nd order) EDM sampling from unit-variance latents."""
    t_steps = karras_sigmas(num_steps, sigma_min, sigma_max, rho)
    x = latents.astype(jnp.float32) * float(t_steps[0])
    rngs = jax.random.split(rng, num_steps)

    for i in range(num_steps):
        t_cur, t_next = float(t_steps[i]), float(t_steps[i + 1])
        gamma = (
            min(s_churn / num_steps, np.sqrt(2.0) - 1.0)
            if s_min <= t_cur <= s_max
            else 0.0
        )
        t_hat = t_cur + gamma * t_cur
        if gamma > 0:
            eps = jax.random.normal(rngs[i], x.shape, x.dtype)
            x = x + np.sqrt(max(t_hat**2 - t_cur**2, 0.0)) * s_noise * eps

        denoised = denoise_fn(x, t_hat)
        d_cur = (x - denoised) / t_hat
        x_euler = x + (t_next - t_hat) * d_cur
        if i < num_steps - 1:  # Heun correction
            denoised2 = denoise_fn(x_euler, t_next)
            d_prime = (x_euler - denoised2) / t_next
            x = x + (t_next - t_hat) * 0.5 * (d_cur + d_prime)
        else:
            x = x_euler
    return x
