"""Timestep respacing: run a model trained on T steps with N << T steps.

Spec: /root/reference/diffusion/model/respace.py (space_timesteps :12-62,
SpacedDiffusion :65-119, _WrappedModel :122-134). The JAX version keeps the
timestep map as a device array and folds the t-index remap into the sampling
scan — no wrapper object, no host sync.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from flax import struct

from pixart_sigma_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
)
from pixart_sigma_tpu.diffusion.schedules import ScheduleCoefficients


def space_timesteps(
    num_timesteps: int, section_counts: Union[str, Sequence[int]]
) -> set[int]:
    """Pick which original-chain timesteps to keep.

    `section_counts` is a list of per-section step counts, a comma-separated
    string, or "ddimN" for DDIM's fixed integer stride.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


@struct.dataclass
class SpacedDiffusion(GaussianDiffusion):
    """GaussianDiffusion over a subsampled chain, with a t-index remap.

    The coefficient arrays are recomputed from the *kept* alphas_cumprod
    (new_beta_i = 1 - acp[t_i]/acp[t_{i-1}]); `timestep_map` converts loop
    indices on the short chain into original-chain timesteps for the model.
    """

    timestep_map: Optional[jnp.ndarray] = None  # [N] int32

    @classmethod
    def from_betas(
        cls,
        *,
        betas: np.ndarray,
        use_timesteps,
        model_mean_type: ModelMeanType,
        model_var_type: ModelVarType,
        loss_type: LossType,
        snr: bool = False,
    ) -> "SpacedDiffusion":
        betas = np.asarray(betas, dtype=np.float64)
        use = set(int(t) for t in use_timesteps)
        acp = np.cumprod(1.0 - betas)
        new_betas, tmap = [], []
        last = 1.0
        for i, a in enumerate(acp):
            if i in use:
                new_betas.append(1.0 - a / last)
                last = a
                tmap.append(i)
        return cls(
            coef=ScheduleCoefficients.create(np.array(new_betas)),
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            snr=snr,
            timestep_map=jnp.asarray(tmap, dtype=jnp.int32),
        )

    # -- model-facing entry points remap t through timestep_map ------------
    def _wrap(self, model_fn):
        if self.timestep_map is None:
            return model_fn
        tmap = self.timestep_map
        return lambda x, t, **kw: model_fn(x, jnp.take(tmap, t), **kw)

    def map_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map short-chain indices to original-chain timesteps."""
        if self.timestep_map is None:
            return t
        return jnp.take(self.timestep_map, t)

    def training_losses(self, model_fn, *args, **kwargs):
        return super().training_losses(self._wrap(model_fn), *args, **kwargs)

    def training_losses_startx(self, model_fn, *args, **kwargs):
        return super().training_losses_startx(self._wrap(model_fn), *args, **kwargs)

    def p_sample(self, model_fn, *args, **kwargs):
        return super().p_sample(self._wrap(model_fn), *args, **kwargs)

    def p_sample_loop(self, model_fn, shape, rng, **kwargs):
        kwargs.setdefault("timestep_map", self.timestep_map)
        return super().p_sample_loop(model_fn, shape, rng, **kwargs)

    def ddim_sample_loop(self, model_fn, shape, rng, **kwargs):
        kwargs.setdefault("timestep_map", self.timestep_map)
        return super().ddim_sample_loop(model_fn, shape, rng, **kwargs)
