"""Beta schedules and precomputed diffusion coefficients.

Spec: /root/reference/diffusion/model/gaussian_diffusion.py:64-151 (schedules)
and :185-227 (derived coefficient arrays). All host-side math is float64 numpy
for exactness; device arrays are materialised once as a pytree of float32
jnp arrays so they can be closed over (constant-folded) or passed through jit.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from flax import struct


def linear_beta_schedule(num_timesteps: int) -> np.ndarray:
    """Ho et al. linear schedule, rescaled so it is invariant to T.

    beta_1 = 0.0001 * (1000/T), beta_T = 0.02 * (1000/T), linearly spaced.
    """
    scale = 1000.0 / num_timesteps
    return np.linspace(
        scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64
    )


def cosine_beta_schedule(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2: betas from the Nichol-Dhariwal cosine alpha-bar."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = np.empty(num_timesteps, dtype=np.float64)
    for i in range(num_timesteps):
        t0 = i / num_timesteps
        t1 = (i + 1) / num_timesteps
        betas[i] = min(1.0 - alpha_bar(t1) / alpha_bar(t0), max_beta)
    return betas


def _warmup_beta(
    beta_start: float, beta_end: float, num_timesteps: int, warmup_frac: float
) -> np.ndarray:
    betas = beta_end * np.ones(num_timesteps, dtype=np.float64)
    warmup_time = int(num_timesteps * warmup_frac)
    betas[:warmup_time] = np.linspace(
        beta_start, beta_end, warmup_time, dtype=np.float64
    )
    return betas


def get_beta_schedule(
    beta_schedule: str, *, beta_start: float, beta_end: float, num_timesteps: int
) -> np.ndarray:
    """Legacy (deprecated-API) beta schedules; spec
    gaussian_diffusion.py:66-98: quad / linear / warmup10 / warmup50 /
    const / jsd."""
    if beta_schedule == "quad":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, num_timesteps, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, num_timesteps, 0.5)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(num_timesteps, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(
            num_timesteps, 1, num_timesteps, dtype=np.float64
        )
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (num_timesteps,)
    return betas


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "squaredcos_cap_v2": cosine_beta_schedule,
}


def named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    """Return the float64 beta array for a named schedule."""
    try:
        return _SCHEDULES[name](num_timesteps)
    except KeyError:
        raise NotImplementedError(f"unknown beta schedule: {name}") from None


@struct.dataclass
class ScheduleCoefficients:
    """All per-timestep coefficient arrays as a jit-friendly pytree.

    Derived in float64 from `betas` then cast to float32. Shapes are all [T],
    except alphas_cumprod_prev/next which follow the iDDPM convention.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # FIXED_LARGE variance: betas with beta_0 replaced by posterior_var_1
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray

    @classmethod
    def create(cls, betas: np.ndarray) -> "ScheduleCoefficients":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (0 < betas).all() and (betas <= 1).all()
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)

        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        # log-variance clipped at t=0 because posterior_variance[0] == 0
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large_var = np.append(posterior_variance[1], betas[1:])

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            alphas_cumprod_next=f32(acp_next),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
            log_betas=f32(np.log(betas)),
            fixed_large_variance=f32(fixed_large_var),
            fixed_large_log_variance=f32(np.log(fixed_large_var)),
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim tensor.

    arr: [T] coefficient array; t: [B] int timesteps; result: [B, 1, ..., 1]
    with `ndim` total dims, ready to broadcast against [B, ...] data.
    """
    out = jnp.take(arr, t, axis=0)
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
