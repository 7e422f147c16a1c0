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

    # -------------------------------------------------- classifier guidance
    def condition_mean(self, cond_fn, p_mean_var, x, t):
        """Shift the posterior mean by variance * grad(log p(y|x)).

        Sohl-Dickstein-style conditioning; spec gaussian_diffusion.py:375-388.
        `cond_fn(x, t) -> gradient` (the caller closes over y / model_kwargs).
        """
        gradient = cond_fn(x, t)
        return p_mean_var["mean"].astype(jnp.float32) + p_mean_var[
            "variance"
        ] * gradient.astype(jnp.float32)

    def condition_score(self, cond_fn, p_mean_var, x, t):
        """Condition the model's score function (Song et al. 2020);
        spec gaussian_diffusion.py:390-404. Returns an updated p_mean_var."""
        nd = x.ndim
        alpha_bar = extract(self.coef.alphas_cumprod, t, nd)
        eps = self.predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1.0 - alpha_bar) * cond_fn(x, t)
        out = dict(p_mean_var)
        out["pred_xstart"] = self.predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(
            out["pred_xstart"], x, t
        )
        return out

    # ---------------------------------------------------------------- sampling
    def p_sample(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        cond_fn: Optional[Callable] = None,
    ):
        """One ancestral sampling step x_t -> x_{t-1}."""
        out = self.p_mean_variance(
            model_fn(x, t), x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )
        if cond_fn is not None:  # classifier guidance (spec :426-427)
            out["mean"] = self.condition_mean(cond_fn, out, x, t)
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
        cond_fn: Optional[Callable] = None,
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
            if cond_fn is not None:
                out["mean"] = self.condition_mean(cond_fn, out, x, t)
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
        cond_fn: Optional[Callable] = None,
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
            if cond_fn is not None:  # score conditioning (spec :529-541)
                out = self.condition_score(cond_fn, out, x, t)
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

    def ddim_reverse_sample(
        self,
        model_output: jnp.ndarray,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        cond_fn: Optional[Callable] = None,
        eta: float = 0.0,
    ):
        """One DDIM reverse-ODE step x_t -> x_{t+1} (inversion).

        Spec: gaussian_diffusion.py:591-628. Deterministic only (eta=0).
        """
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(
            model_output, x, t, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        c = self.coef
        nd = x.ndim
        # re-derive eps in case the model predicts x_start or x_prev
        eps = (
            extract(c.sqrt_recip_alphas_cumprod, t, nd) * x
            - out["pred_xstart"]
        ) / extract(c.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = extract(c.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1.0 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample_loop(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        clip_denoised: bool = True,
        timestep_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full inversion x_0 -> x_T as one lax.scan (t = 0 .. T-1).

        Composes the reference's ddim_reverse_sample step (:591-628) into the
        TPU-native trajectory form (the reference leaves loop composition to
        the caller).
        """
        T = self.num_timesteps
        B = x.shape[0]

        def body(x, i):
            t = jnp.full((B,), i, dtype=jnp.int32)
            t_model = jnp.take(timestep_map, t) if timestep_map is not None else t
            out = self.ddim_reverse_sample(
                model_fn(x, t_model), x, t, clip_denoised=clip_denoised
            )
            return out["sample"], None

        x, _ = jax.lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
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
    def compute_snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """Signal-to-noise ratio of q(x_t | x_0): alpha_bar / (1 - alpha_bar).

        Matches diffusers' training_utils.compute_snr used by the reference's
        Min-SNR weighting (train_pixart_lora_hf.py:864-875)."""
        acp = jnp.asarray(self.coef.alphas_cumprod)[t]
        return acp / (1.0 - acp)

    def min_snr_weight(
        self, t: jnp.ndarray, gamma: float, prediction_type: str = "epsilon"
    ) -> jnp.ndarray:
        """Per-sample Min-SNR-gamma MSE weights (arXiv 2303.09556 §3.4/4.2).

        Spec /root/reference/train_scripts/train_pixart_lora_hf.py:864-875:
        epsilon objective -> min(snr, gamma)/snr; v objective -> the same
        with snr+1 in the denominator."""
        snr = self.compute_snr(t)
        w = jnp.minimum(snr, gamma)
        if prediction_type == "v_prediction":
            return w / (snr + 1.0)
        return w / snr

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        skip_noise: bool = False,
        loss_weight: Optional[jnp.ndarray] = None,
        mse_weight: Optional[jnp.ndarray] = None,
        mask_loss_coef: float = 0.0,
        patch_size: int = 2,
    ) -> dict[str, Any]:
        """Per-sample training losses; spec gaussian_diffusion.py:744-855.

        Returns {"loss", "mse", "vb"?, "pred_xstart", "x_t"} each [B].
        `loss_weight` optionally reweights per-sample (importance sampling).
        `mse_weight` reweights ONLY the mse term (Min-SNR-gamma; the learned
        variance's vb term keeps its own scale).

        Masked-token training (spec :836-849): when the model returns a
        tuple ``(output, token_mask)`` — token_mask [B, L] with 1 = removed
        patch, as produced by the model's mask_ratio path — the MSE is
        averaged per PATCH (channel-mean + patch_size avg-pool) over KEPT
        patches only, and ``mask_loss_coef > 0`` adds the reference's "mae"
        term over the removed patches.
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
        token_mask = None
        if isinstance(model_output, (tuple, list)):
            model_output, token_mask = model_output

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

        sq_err = (target - output) ** 2
        if token_mask is not None:
            # masked-token training (spec :836-849): per-patch loss =
            # channel mean + patch_size x patch_size average pool, then
            # masked means over kept (mse) / removed (mae) patches. Formulas
            # kept literally as mean_flat(loss*m) * L / m.sum() for
            # goldenness vs the reference.
            B, H, W, _ = sq_err.shape
            p = patch_size
            per_pix = jnp.mean(sq_err, axis=-1)  # [B, H, W] (torch dim=1)
            per_patch = per_pix.reshape(B, H // p, p, W // p, p).mean(
                axis=(2, 4)
            ).reshape(B, -1)  # [B, L] == F.avg_pool2d(...).flatten(1)
            token_mask = token_mask.astype(per_patch.dtype)
            unmask = 1.0 - token_mask
            L = unmask.shape[1]
            terms["mse"] = (
                mean_flat(per_patch * unmask) * L / jnp.sum(unmask, axis=1)
            )
            if mask_loss_coef > 0:
                terms["mae"] = (
                    mask_loss_coef
                    * mean_flat(per_patch * token_mask)
                    * L / jnp.sum(token_mask, axis=1)
                )
        else:
            terms["mse"] = mean_flat(sq_err)
        if mse_weight is not None:
            terms["mse"] = terms["mse"] * mse_weight
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0) + terms.get("mae", 0.0)
        if loss_weight is not None:
            terms["loss"] = terms["loss"] * loss_weight
        terms["pred_xstart"] = pred_xstart
        terms["x_t"] = x_t
        return terms

    def training_losses_diffusers(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        timestep: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        skip_noise: bool = False,
        return_startx: bool = False,
    ):
        """Diffusers-convention loss entry; spec gaussian_diffusion.py:857-956.

        The reference variant exists to call HF Transformer2DModel
        (`model(x_t, timestep=t, ..., return_dict=False)[0]`); the math is
        identical to `training_losses`. Here `model_fn(x_t, timestep=t)`
        returns the channel-last tensor; `return_startx` mirrors the
        reference's return_startx early-exit (:894-898, used by LCM).
        """
        t = timestep
        if skip_noise:
            x_t = x_start
        else:
            if noise is None:
                noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
        wrapped = lambda x, tt: model_fn(x, timestep=tt)
        if return_startx and self.model_mean_type == ModelMeanType.EPSILON:
            output, _ = self._split_output(wrapped(x_t, t), x_t)
            return output, self.predict_xstart_from_eps(x_t, t, output), x_t
        return self.training_losses(
            wrapped, x_start, t, noise=noise, skip_noise=skip_noise
        )

    # --------------------------------------------------------------- NLL eval
    def prior_bpd(self, x_start: jnp.ndarray) -> jnp.ndarray:
        """Prior KL term of the VLB in bits/dim; spec :957-972."""
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / jnp.log(2.0)

    def calc_bpd_loop(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        rng: jax.Array,
        clip_denoised: bool = True,
        timestep_map: Optional[jnp.ndarray] = None,
    ):
        """Full variational lower bound in bits/dim; spec :974-1027.

        One lax.scan over t = T-1 .. 0 (the reference's python loop), each
        step drawing fresh noise and evaluating the VLB term. Returns
        total_bpd/prior_bpd [B] and vb/xstart_mse/mse [B, T] (T-major order
        matching the reference's stacking: column j is timestep T-1-j).
        """
        T = self.num_timesteps
        B = x_start.shape[0]
        step_rngs = jax.random.split(rng, T)

        def body(carry, inp):
            i, step_rng = inp  # T-1 .. 0
            t = jnp.full((B,), i, dtype=jnp.int32)
            t_model = jnp.take(timestep_map, t) if timestep_map is not None else t
            noise = jax.random.normal(step_rng, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self.vb_terms_bpd(
                model_fn(x_t, t_model), x_start, x_t, t,
                clip_denoised=clip_denoised,
            )
            eps = self.predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return carry, {
                "vb": out["output"],
                "xstart_mse": mean_flat((out["pred_xstart"] - x_start) ** 2),
                "mse": mean_flat((eps - noise) ** 2),
            }

        idx = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        _, seq = jax.lax.scan(body, 0, (idx, step_rngs))
        vb = jnp.swapaxes(seq["vb"], 0, 1)  # [B, T]
        prior = self.prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior,
            "prior_bpd": prior,
            "vb": vb,
            "xstart_mse": jnp.swapaxes(seq["xstart_mse"], 0, 1),
            "mse": jnp.swapaxes(seq["mse"], 0, 1),
        }

    def training_losses_startx(self, model_fn, x_start, t, rng=None, noise=None):
        """LCM path: return (eps_pred, pred_x0, x_t); spec :786-790."""
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        output, _ = self._split_output(model_fn(x_t, t), x_t)
        return output, self.predict_xstart_from_eps(x_t, t, output), x_t
