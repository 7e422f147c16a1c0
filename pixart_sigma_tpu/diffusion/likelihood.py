"""Gaussian likelihood helpers for the iDDPM variational bound.

Spec: /root/reference/diffusion/model/diffusion_utils.py (normal_kl,
approx_standard_normal_cdf, discretized_gaussian_log_likelihood). Standard
iDDPM math, implemented directly in jnp.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, exp(logvar1)) || N(mean2, exp(logvar2))), elementwise (nats)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Tanh-based approximation of the standard normal CDF (iDDPM/PixelCNN++)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretised to 255 uniform bins on [-1, 1].

    x is assumed rescaled to [-1, 1]; returns elementwise log-probs (nats).
    """
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def mean_flat(tensor):
    """Mean over all non-batch dimensions."""
    return jnp.mean(tensor, axis=tuple(range(1, tensor.ndim)))
