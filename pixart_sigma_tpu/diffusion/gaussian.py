"""iDDPM Gaussian diffusion core: q/p math, sampling loops, training losses.

Behavioural spec: /root/reference/diffusion/model/gaussian_diffusion.py
(q_sample :255, q_posterior :264, p_mean_variance :285, p_sample_loop :448,
ddim loops :542-710, _vb_terms_bpd :711, training_losses :744-855). This is a
fresh, functional JAX implementation, TPU-first:

- channel-LAST data layout ([B, H, W, C]); the learned-variance head is split
  along the last axis (reference splits NCHW dim=1)
- `GaussianDiffusion` is a flax.struct pytree of precomputed f32 coefficient
  arrays with static enum config — it passes straight through jit boundaries
- full sampling trajectories are `lax.scan` loops over static step counts, so
  the entire trajectory compiles to one XLA program with zero host syncs
- randomness is explicit `jax.random` keys (no global RNG state)

Model convention: `model_fn(x_t, t) -> [B, ..., 2C]` (learned variance) or
`[B, ..., C]`. Conditioning (text embeddings, CFG) is closed over by the
caller — see pixart_sigma_tpu/pipelines.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pixart_sigma_tpu.diffusion.likelihood import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)
from pixart_sigma_tpu.diffusion.schedules import (
    ScheduleCoefficients,
    extract,
    named_beta_schedule,
)

ModelFn = Callable[..., jnp.ndarray]


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


@struct.dataclass
class GaussianDiffusion:
    """Pytree of schedule coefficients + static diffusion config."""

    coef: ScheduleCoefficients
    model_mean_type: ModelMeanType = struct.field(pytree_node=False)
    model_var_type: ModelVarType = struct.field(pytree_node=False)
    loss_type: LossType = struct.field(pytree_node=False)
    snr: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------ build
    @classmethod
    def create(
        cls,
        *,
        betas=None,
        schedule: str = "linear",
        num_timesteps: int = 1000,
        model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
        model_var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
        loss_type: LossType = LossType.MSE,
        snr: bool = False,
    ) -> "GaussianDiffusion":
        if betas is None:
            betas = named_beta_schedule(schedule, num_timesteps)
        return cls(
            coef=ScheduleCoefficients.create(betas),
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            snr=snr,
        )

    @property
    def num_timesteps(self) -> int:
        return self.coef.num_timesteps

    # --------------------------------------------------------------- q process
    def q_mean_variance(self, x_start, t):
        c = self.coef
        nd = x_start.ndim
        mean = extract(c.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - c.alphas_cumprod, t, nd)
        log_variance = extract(c.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_start to timestep t given unit Gaussian noise."""
        c = self.coef
        nd = x_start.ndim
        return (
            extract(c.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(c.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        """Mean/variance of q(x_{t-1} | x_t, x_0)."""
        c = self.coef
        nd = x_t.ndim
        mean = (
            extract(c.posterior_mean_coef1, t, nd) * x_start
            + extract(c.posterior_mean_coef2, t, nd) * x_t
        )
        variance = extract(c.posterior_variance, t, nd)
        log_variance = extract(c.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # ----------------------------------------------------------- x0/eps algebra
    def predict_xstart_from_eps(self, x_t, t, eps):
        c = self.coef
        nd = x_t.ndim
        return (
            extract(c.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(c.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        c = self.coef
        nd = x_t.ndim
        return (
            extract(c.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / extract(c.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        c = self.coef
        nd = x_t.ndim
        coef1 = extract(c.posterior_mean_coef1, t, nd)
        coef2 = extract(c.posterior_mean_coef2, t, nd)
        return xprev / coef1 - (coef2 / coef1) * x_t

    # ------------------------------------------------------------- p process
    def model_variance(self, model_var_values, x_t, t):
        """Resolve the (variance, log_variance) of p(x_{t-1}|x_t).

        For LEARNED/LEARNED_RANGE, `model_var_values` is the second half of
        the model output; otherwise it is ignored.
        """
        c = self.coef
        nd = x_t.ndim
        if self.model_var_type == ModelVarType.LEARNED:
            log_variance = model_var_values
            variance = jnp.exp(log_variance)
        elif self.model_var_type == ModelVarType.LEARNED_RANGE:
            min_log = extract(c.posterior_log_variance_clipped, t, nd)
            max_log = extract(c.log_betas, t, nd)
            frac = (model_var_values + 1.0) / 2.0
            log_variance = frac * max_log + (1.0 - frac) * min_log
            variance = jnp.exp(log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            variance = extract(c.fixed_large_variance, t, nd)
            log_variance = extract(c.fixed_large_log_variance, t, nd)
        elif self.model_var_type == ModelVarType.FIXED_SMALL:
            variance = extract(c.posterior_variance, t, nd)
            log_variance = extract(c.posterior_log_variance_clipped, t, nd)
        else:
            raise NotImplementedError(self.model_var_type)
        return variance, log_variance

    def _split_output(self, model_output, x_t):
        """Split a learned-variance model output along the LAST axis."""
        C = x_t.shape[-1]
        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            assert model_output.shape[-1] == 2 * C, (
                f"expected 2*{C} channels, got {model_output.shape[-1]}"
            )
            return model_output[..., :C], model_output[..., C:]
        return model_output, None

    def p_mean_variance(
        self,
        model_output: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
    ):
        """Mean/variance of p(x_{t-1}|x_t) plus the implied x0 prediction.

        Takes the raw model output tensor (not a callable) so the caller
        controls how/where the network runs (CFG batching, remat, sharding).
        """
        out, var_values = self._split_output(model_output, x_t)
        variance, log_variance = self.model_variance(var_values, x_t, t)

        def process_xstart(x):
            if denoised_fn is not None:
                x = denoised_fn(x)
            if clip_denoised:
                x = jnp.clip(x, -1.0, 1.0)
            return x

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(out)
            mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)
        elif self.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = process_xstart(self.predict_xstart_from_eps(x_t, t, out))
            mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)
        elif self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self.predict_xstart_from_xprev(x_t, t, out))
            mean = out
        else:
            raise NotImplementedError(self.model_mean_type)
        return {
            "mean": mean,
            "variance": variance,
            "log_variance": log_variance,
            "pred_xstart": pred_xstart,
        }

    # ---------------------------------------------------------------- sampling
    def p_sample(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
    ):
        """One ancestral sampling step x_t -> x_{t-1}."""
        out = self.p_mean_variance(
            model_fn(x, t), x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return sample, out["pred_xstart"]

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape,
        rng: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        timestep_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full ancestral trajectory as one lax.scan (T model calls on-device).

        `timestep_map` (from SpacedDiffusion) maps loop indices to the
        original-chain timesteps fed to the model.
        """
        T = self.num_timesteps
        rng, init_rng = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(init_rng, shape)
        step_rngs = jax.random.split(rng, T)

        def body(x, inp):
            i, step_rng = inp  # i runs T-1 .. 0
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            if timestep_map is not None:
                t_model = jnp.take(timestep_map, t)
            else:
                t_model = t
            out = self.p_mean_variance(
                model_fn(x, t_model),
                x,
                t,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
            )
            z = jax.random.normal(step_rng, x.shape, dtype=x.dtype)
            nonzero = (t != 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
            x = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * z
            return x, None

        idx = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        x, _ = jax.lax.scan(body, x, (idx, step_rngs))
        return x

    def ddim_sample_loop(
        self,
        model_fn: ModelFn,
        shape,
        rng: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        eta: float = 0.0,
        timestep_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DDIM trajectory as one lax.scan. Spec: gaussian_diffusion.py:542-652."""
        T = self.num_timesteps
        c = self.coef
        rng, init_rng = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(init_rng, shape)
        step_rngs = jax.random.split(rng, T)
        nd = len(shape)

        def body(x, inp):
            i, step_rng = inp
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            t_model = jnp.take(timestep_map, t) if timestep_map is not None else t
            out = self.p_mean_variance(
                model_fn(x, t_model), x, t, clip_denoised=clip_denoised
            )
            eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
            alpha_bar = extract(c.alphas_cumprod, t, nd)
            alpha_bar_prev = extract(c.alphas_cumprod_prev, t, nd)
            sigma = (
                eta
                * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
            )
            mean_pred = (
                out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
            )
            z = jax.random.normal(step_rng, x.shape, dtype=x.dtype)
            nonzero = (t != 0).astype(x.dtype).reshape(-1, *((1,) * (nd - 1)))
            x = mean_pred + nonzero * sigma * z
            return x, None

        idx = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        x, _ = jax.lax.scan(body, x, (idx, step_rngs))
        return x

    # -------------------------------------------------------------------- VLB
    def vb_terms_bpd(self, model_output, x_start, x_t, t, clip_denoised=False):
        """Variational-bound term (bits/dim) for one timestep.

        KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) for t>0, decoder NLL at t=0.
        """
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_output, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / jnp.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    # ----------------------------------------------------------------- losses
    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        skip_noise: bool = False,
        loss_weight: Optional[jnp.ndarray] = None,
    ) -> dict[str, Any]:
        """Per-sample training losses; spec gaussian_diffusion.py:744-855.

        Returns {"loss", "mse", "vb"?, "pred_xstart", "x_t"} each [B].
        `loss_weight` optionally reweights per-sample (importance sampling).
        """
        if skip_noise:
            x_t = x_start
            assert noise is not None or self.model_mean_type != ModelMeanType.EPSILON
        else:
            if noise is None:
                noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)

        terms: dict[str, Any] = {}
        model_output = model_fn(x_t, t)

        if self.loss_type.is_vb():
            terms["loss"] = self.vb_terms_bpd(
                model_output, x_start, x_t, t, clip_denoised=False
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        output, var_values = self._split_output(model_output, x_t)

        if var_values is not None:
            # Learn the variance with the VLB but freeze the mean branch.
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(output), var_values], axis=-1
            )
            terms["vb"] = self.vb_terms_bpd(
                frozen, x_start, x_t, t, clip_denoised=False
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = {
            ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                x_start, x_t, t
            )[0],
            ModelMeanType.START_X: lambda: x_start,
            ModelMeanType.EPSILON: lambda: noise,
        }[self.model_mean_type]()

        if self.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = self.predict_xstart_from_eps(x_t, t, output)
        elif self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = output
        else:
            pred_xstart = self.predict_xstart_from_xprev(x_t, t, output)

        if self.snr:
            # SNR-switching objective: eps prediction for t>249, x0 below.
            if self.model_mean_type == ModelMeanType.START_X:
                pred_noise = self.predict_eps_from_xstart(x_t, t, output)
                pred_startx = output
            elif self.model_mean_type == ModelMeanType.EPSILON:
                pred_noise = output
                pred_startx = pred_xstart
            else:
                raise NotImplementedError("snr with PREVIOUS_X")
            tb = t.reshape(-1, *((1,) * (x_t.ndim - 1)))
            target = jnp.where(tb > 249, noise, x_start)
            output = jnp.where(tb > 249, pred_noise, pred_startx)

        terms["mse"] = mean_flat((target - output) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        if loss_weight is not None:
            terms["loss"] = terms["loss"] * loss_weight
        terms["pred_xstart"] = pred_xstart
        terms["x_t"] = x_t
        return terms

    def training_losses_startx(self, model_fn, x_start, t, rng=None, noise=None):
        """LCM path: return (eps_pred, pred_x0, x_t); spec :786-790."""
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        output, _ = self._split_output(model_fn(x_t, t), x_t)
        return output, self.predict_xstart_from_eps(x_t, t, output), x_t
