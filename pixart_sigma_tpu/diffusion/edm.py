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


def ablation_sampler(
    denoise_fn: Callable,
    latents: jnp.ndarray,
    rng: jax.Array,
    num_steps: int = 18,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    rho: float = 7.0,
    solver: str = "heun",
    discretization: str = "edm",
    schedule: str = "linear",
    scaling: str = "none",
    epsilon_s: float = 1e-3,
    c1: float = 0.001,
    c2: float = 0.008,
    m_steps: int = 1000,
    alpha: float = 1.0,
    s_churn: float = 0.0,
    s_min: float = 0.0,
    s_max: float = float("inf"),
    s_noise: float = 1.0,
) -> jnp.ndarray:
    """Generalized ablation sampler: the superset of samplers from Karras et
    al. 2022 (spec: /root/reference/diffusion/model/edm_sample.py:54-171).

    Schedules/discretizations are precomputed host-side in float64; the model
    is only queried through `denoise_fn(x, sigma) -> x0-estimate`.
    """
    assert solver in ("euler", "heun")
    assert discretization in ("vp", "ve", "iddpm", "edm")
    assert schedule in ("vp", "ve", "linear")
    assert scaling in ("vp", "none")

    def vp_sigma(beta_d, beta_min):
        return lambda t: np.sqrt(np.exp(0.5 * beta_d * t**2 + beta_min * t) - 1)

    def vp_sigma_deriv(beta_d, beta_min, sig):
        return lambda t: 0.5 * (beta_min + beta_d * t) * (sig(t) + 1 / sig(t))

    def vp_sigma_inv(beta_d, beta_min):
        return lambda s: (
            np.sqrt(beta_min**2 + 2 * beta_d * np.log(s**2 + 1)) - beta_min
        ) / beta_d

    if sigma_min is None:
        vp_def = vp_sigma(19.1, 0.1)(epsilon_s)
        sigma_min = {"vp": vp_def, "ve": 0.02, "iddpm": 0.002, "edm": 0.002}[
            discretization
        ]
    if sigma_max is None:
        vp_def = vp_sigma(19.1, 0.1)(1.0)
        sigma_max = {"vp": vp_def, "ve": 100.0, "iddpm": 81.0, "edm": 80.0}[
            discretization
        ]

    vp_beta_d = (
        2
        * (np.log(sigma_min**2 + 1) / epsilon_s - np.log(sigma_max**2 + 1))
        / (epsilon_s - 1)
    )
    vp_beta_min = np.log(sigma_max**2 + 1) - 0.5 * vp_beta_d

    idx = np.arange(num_steps, dtype=np.float64)
    if discretization == "vp":
        orig_t = 1 + idx / (num_steps - 1) * (epsilon_s - 1)
        sigma_steps = vp_sigma(vp_beta_d, vp_beta_min)(orig_t)
    elif discretization == "ve":
        orig_t = sigma_max**2 * (sigma_min**2 / sigma_max**2) ** (
            idx / (num_steps - 1)
        )
        sigma_steps = np.sqrt(orig_t)
    elif discretization == "iddpm":
        u = np.zeros(m_steps + 1, dtype=np.float64)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / m_steps / (c2 + 1)) ** 2
        for j in range(m_steps, 0, -1):
            u[j - 1] = np.sqrt(
                (u[j] ** 2 + 1)
                / max(alpha_bar(j - 1) / alpha_bar(j), c1)
                - 1
            )
        u_filtered = u[(u >= sigma_min) & (u <= sigma_max)]
        pick = np.round(
            (len(u_filtered) - 1) / (num_steps - 1) * idx
        ).astype(np.int64)
        sigma_steps = u_filtered[pick]
    else:
        sigma_steps = (
            sigma_max ** (1 / rho)
            + idx / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
        ) ** rho

    if schedule == "vp":
        sigma = vp_sigma(vp_beta_d, vp_beta_min)
        sigma_deriv = vp_sigma_deriv(vp_beta_d, vp_beta_min, sigma)
        sigma_inv = vp_sigma_inv(vp_beta_d, vp_beta_min)
    elif schedule == "ve":
        sigma = lambda t: np.sqrt(t)
        sigma_deriv = lambda t: 0.5 / np.sqrt(t)
        sigma_inv = lambda s: s**2
    else:
        sigma = lambda t: t
        sigma_deriv = lambda t: 1.0
        sigma_inv = lambda s: s

    if scaling == "vp":
        s_fn = lambda t: 1 / np.sqrt(1 + sigma(t) ** 2)
        s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * s_fn(t) ** 3
    else:
        s_fn = lambda t: 1.0
        s_deriv = lambda t: 0.0

    t_steps = np.append(sigma_inv(sigma_steps), 0.0)
    rngs = jax.random.split(rng, num_steps)

    t_next = t_steps[0]
    x_next = latents.astype(jnp.float32) * float(sigma(t_next) * s_fn(t_next))
    for i in range(num_steps):
        t_cur, t_next = float(t_steps[i]), float(t_steps[i + 1])
        x_cur = x_next

        gamma = (
            min(s_churn / num_steps, np.sqrt(2.0) - 1.0)
            if s_min <= sigma(t_cur) <= s_max
            else 0.0
        )
        t_hat = float(sigma_inv(sigma(t_cur) + gamma * sigma(t_cur)))
        noise_scale = float(
            np.sqrt(max(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0)) * s_fn(t_hat)
        )
        x_hat = float(s_fn(t_hat) / s_fn(t_cur)) * x_cur
        if noise_scale > 0:
            x_hat = x_hat + noise_scale * s_noise * jax.random.normal(
                rngs[i], x_cur.shape, x_cur.dtype
            )

        h = t_next - t_hat
        denoised = denoise_fn(x_hat / float(s_fn(t_hat)), float(sigma(t_hat)))
        d_cur = (
            float(sigma_deriv(t_hat) / sigma(t_hat) + s_deriv(t_hat) / s_fn(t_hat))
            * x_hat
            - float(sigma_deriv(t_hat) * s_fn(t_hat) / sigma(t_hat)) * denoised
        )
        if solver == "euler" or i == num_steps - 1:
            x_next = x_hat + h * d_cur
        else:
            x_prime = x_hat + alpha * h * d_cur
            t_prime = t_hat + alpha * h
            denoised2 = denoise_fn(
                x_prime / float(s_fn(t_prime)), float(sigma(t_prime))
            )
            d_prime = (
                float(
                    sigma_deriv(t_prime) / sigma(t_prime)
                    + s_deriv(t_prime) / s_fn(t_prime)
                )
                * x_prime
                - float(sigma_deriv(t_prime) * s_fn(t_prime) / sigma(t_prime))
                * denoised2
            )
            x_next = x_hat + h * (
                (1 - 1 / (2 * alpha)) * d_cur + 1 / (2 * alpha) * d_prime
            )
    return x_next
