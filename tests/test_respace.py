"""Parity of timestep respacing vs the torch reference."""

import numpy as np
import pytest

from pixart_sigma_tpu.diffusion import IDDPM
from pixart_sigma_tpu.diffusion.respace import space_timesteps
from tests.reference_shim import install_reference

install_reference()
from diffusion.model import gaussian_diffusion as ref_gd  # noqa: E402
from diffusion.model import respace as ref_respace  # noqa: E402


@pytest.mark.parametrize(
    "counts", [[1000], [25], [10, 15, 20], "ddim25", "ddim50", "10,20"]
)
def test_space_timesteps_matches(counts):
    assert space_timesteps(1000, counts) == ref_respace.space_timesteps(1000, counts)


@pytest.mark.parametrize("respacing", [[25], [1000], "ddim25"])
def test_spaced_betas_and_map_match(respacing):
    ours = IDDPM(timestep_respacing=respacing, learn_sigma=True)
    betas = ref_gd.get_named_beta_schedule("linear", 1000)
    ref = ref_respace.SpacedDiffusion(
        use_timesteps=ref_respace.space_timesteps(1000, respacing),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
    )
    np.testing.assert_array_equal(np.asarray(ours.timestep_map), ref.timestep_map)
    np.testing.assert_allclose(
        np.asarray(ours.coef.betas), ref.betas.astype(np.float32), rtol=1e-6, atol=1e-7
    )
