"""Factory for the training/ancestral-sampling diffusion (iDDPM flavour).

Spec: /root/reference/diffusion/iddpm.py:9-53. Same knob surface as the
reference's IDDPM() builder.
"""

from __future__ import annotations

from pixart_sigma_tpu.diffusion.gaussian import (
    LossType,
    ModelMeanType,
    ModelVarType,
)
from pixart_sigma_tpu.diffusion.respace import SpacedDiffusion, space_timesteps
from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule


def IDDPM(
    timestep_respacing=None,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    pred_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
    snr: bool = False,
) -> SpacedDiffusion:
    """Build a SpacedDiffusion configured like the reference's IDDPM()."""
    betas = named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    if not pred_sigma:
        var_type = None
    elif learn_sigma:
        var_type = ModelVarType.LEARNED_RANGE
    else:
        var_type = ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE
    return SpacedDiffusion.from_betas(
        betas=betas,
        use_timesteps=space_timesteps(diffusion_steps, timestep_respacing),
        model_mean_type=(
            ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
        ),
        model_var_type=var_type,
        loss_type=loss_type,
        snr=snr,
    )
