"""Golden parity: beta schedules + coefficient arrays vs the torch reference."""

import numpy as np
import pytest

from pixart_sigma_tpu.diffusion.schedules import (
    ScheduleCoefficients,
    named_beta_schedule,
)
from tests.reference_shim import install_reference

install_reference()
from diffusion.model import gaussian_diffusion as ref_gd  # noqa: E402


@pytest.mark.parametrize("name", ["linear", "squaredcos_cap_v2"])
@pytest.mark.parametrize("steps", [1000, 250, 25])
def test_named_beta_schedule_matches_reference(name, steps):
    ours = named_beta_schedule(name, steps)
    theirs = ref_gd.get_named_beta_schedule(name, steps)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


def test_coefficients_match_reference():
    betas = named_beta_schedule("linear", 1000)
    ref = ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
    )
    c = ScheduleCoefficients.create(betas)
    pairs = [
        (c.alphas_cumprod, ref.alphas_cumprod),
        (c.alphas_cumprod_prev, ref.alphas_cumprod_prev),
        (c.alphas_cumprod_next, ref.alphas_cumprod_next),
        (c.sqrt_alphas_cumprod, ref.sqrt_alphas_cumprod),
        (c.sqrt_one_minus_alphas_cumprod, ref.sqrt_one_minus_alphas_cumprod),
        (c.log_one_minus_alphas_cumprod, ref.log_one_minus_alphas_cumprod),
        (c.sqrt_recip_alphas_cumprod, ref.sqrt_recip_alphas_cumprod),
        (c.sqrt_recipm1_alphas_cumprod, ref.sqrt_recipm1_alphas_cumprod),
        (c.posterior_variance, ref.posterior_variance),
        (c.posterior_log_variance_clipped, ref.posterior_log_variance_clipped),
        (c.posterior_mean_coef1, ref.posterior_mean_coef1),
        (c.posterior_mean_coef2, ref.posterior_mean_coef2),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs, dtype=np.float32),
            rtol=2e-6, atol=1e-7,
        )
