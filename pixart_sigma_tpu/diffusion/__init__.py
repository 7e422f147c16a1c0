"""Diffusion processes: schedules, iDDPM core, respacing, and samplers.

Behavioural spec: /root/reference/diffusion/model/{gaussian_diffusion,respace,
dpm_solver,sa_solver}.py and /root/reference/diffusion/{iddpm,dpm_solver,
sa_sampler,lcm_scheduler}.py. Everything here is a fresh JAX implementation:
schedule math precomputed in float64 numpy on host, per-step math fused under
jit, and full sampling trajectories compiled as lax.scan loops so they stay
on-device.
"""

from pixart_sigma_tpu.diffusion.schedules import (  # noqa: F401
    named_beta_schedule,
    ScheduleCoefficients,
)
from pixart_sigma_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    LossType,
)
from pixart_sigma_tpu.diffusion.respace import (  # noqa: F401
    space_timesteps,
    SpacedDiffusion,
)
from pixart_sigma_tpu.diffusion.factory import IDDPM  # noqa: F401
from pixart_sigma_tpu.diffusion.dpm_solver import (  # noqa: F401
    NoiseScheduleVP,
    DPMSolver,
    dpm_solver_sample,
)
