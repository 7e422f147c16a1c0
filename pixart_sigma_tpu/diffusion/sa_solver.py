"""SA-Solver: stochastic Adams predictor-corrector sampler.

Behavioural spec: /root/reference/diffusion/model/sa_solver.py (exponential
integrals :426-477, Lagrange coefficients :478-540, Adams-Bashforth/Moulton
updates :562-754, sample_few_steps :755-910, sample_more_steps :911-1065) and
the SASolverSampler facade /root/reference/diffusion/sa_sampler.py:10-93.

TPU-first: every gradient coefficient (exponential-integral x Lagrange) is a
pure function of the STATIC timestep grid and tau schedule, so it is all
precomputed host-side in float64; the device program is `steps` model calls
plus linear combinations and per-step Gaussian noise, unrolled under jit.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.diffusion.dpm_solver import (
    ContinuousModelFn,
    NoiseScheduleVP,
)


# ----------------------------------------------------------------------
# host-side coefficient math (float64 scalars)
# ----------------------------------------------------------------------

def _exp_int_negative(order: int, a: float, b: float) -> float:
    """Integral of exp(-x) x^order dx on [a, b] (noise-prediction branch)."""
    eab = math.exp(b - a)
    if order == 0:
        return math.exp(-b) * (eab - 1)
    if order == 1:
        return math.exp(-b) * ((a + 1) * eab - (b + 1))
    if order == 2:
        return math.exp(-b) * ((a**2 + 2 * a + 2) * eab - (b**2 + 2 * b + 2))
    if order == 3:
        return math.exp(-b) * (
            (a**3 + 3 * a**2 + 6 * a + 6) * eab - (b**3 + 3 * b**2 + 6 * b + 6)
        )
    raise ValueError(order)


def _exp_int_positive(order: int, a: float, b: float, tau: float) -> float:
    """Integral of exp(x(1+tau^2)) x^order dx on [a, b] (data-prediction)."""
    s = 1 + tau**2
    ac, bc = s * a, s * b
    e = math.exp(bc)
    d = math.exp(-(bc - ac))
    if order == 0:
        return e * (1 - d) / s
    if order == 1:
        return e * ((bc - 1) - (ac - 1) * d) / s**2
    if order == 2:
        return e * ((bc**2 - 2 * bc + 2) - (ac**2 - 2 * ac + 2) * d) / s**3
    if order == 3:
        return e * (
            (bc**3 - 3 * bc**2 + 6 * bc - 6) - (ac**3 - 3 * ac**2 + 6 * ac - 6) * d
        ) / s**4
    raise ValueError(order)


def _lagrange_coeffs(order: int, lams: Sequence[float]) -> List[List[float]]:
    """Coefficients of each Lagrange basis polynomial in monomial form."""
    assert order == len(lams) - 1
    if order == 0:
        return [[1.0]]
    out = []
    for i in range(order + 1):
        denom = 1.0
        for j in range(order + 1):
            if j != i:
                denom *= lams[i] - lams[j]
        # expand prod_j (x - lam_j) into monomial coefficients (highest first)
        poly = [1.0]
        for j in range(order + 1):
            if j == i:
                continue
            new = [0.0] * (len(poly) + 1)
            for k, c in enumerate(poly):
                new[k] += c
                new[k + 1] += -lams[j] * c
            poly = new
        out.append([c / denom for c in poly])
    return out


def _gradient_coefficients(
    order: int,
    interval_start: float,
    interval_end: float,
    lams: Sequence[float],
    tau: float,
    predict_x0: bool,
) -> List[float]:
    """Spec: get_coefficients_fn (sa_solver.py:541-561)."""
    assert order == len(lams)
    lagr = _lagrange_coeffs(order - 1, lams)
    coeffs = []
    for i in range(order):
        c = 0.0
        for j in range(order):
            if predict_x0:
                c += lagr[i][j] * _exp_int_positive(
                    order - 1 - j, interval_start, interval_end, tau
                )
            else:
                c += lagr[i][j] * _exp_int_negative(
                    order - 1 - j, interval_start, interval_end
                )
        coeffs.append(c)
    return coeffs


def sa_get_time_steps(
    ns: NoiseScheduleVP, skip_type: str, t_T: float, t_0: float, N: int, order: int
) -> np.ndarray:
    """Spec: SASolver.get_time_steps (:398-419)."""
    if skip_type == "logSNR":
        lam_T = float(ns.marginal_lambda(t_T))
        lam_0 = float(ns.marginal_lambda(t_0))
        steps = lam_T + np.linspace(0.0, (lam_0 - lam_T) ** (1.0 / order), N + 1) ** order
        return np.asarray(ns.inverse_lambda(steps))
    if skip_type == "time":
        return np.linspace(t_T ** (1.0 / order), t_0 ** (1.0 / order), N + 1) ** order
    if skip_type == "karras":
        # rho-7 spacing in EDM sigma = std/alpha = exp(-lambda), clamped to
        # [max(0.002, sigma(t_0')), min(80, sigma(t_T'))] with t_0'=1e-3,
        # t_T'=T like the reference (spec :356-358, :411-416).
        rho = 7.0
        sigma_min = max(0.002, math.exp(-float(ns.marginal_lambda(1e-3))))
        sigma_max = min(80.0, math.exp(-float(ns.marginal_lambda(ns.T))))
        ramp = np.linspace(sigma_max ** (1 / rho), sigma_min ** (1 / rho), N + 1)
        sigmas = ramp**rho
        return np.asarray(ns.inverse_lambda(-np.log(sigmas)))
    raise ValueError(f"unsupported skip_type {skip_type}")


# ----------------------------------------------------------------------
# the solver
# ----------------------------------------------------------------------

TauFn = Union[float, Callable[[float], float]]


class SASolver:
    """Stochastic Adams solver over a noise-prediction model_fn.

    model_fn(x, t_cont) -> eps (CFG handled by the caller's wrapper, same
    contract as DPMSolver).
    """

    def __init__(
        self,
        model_fn: ContinuousModelFn,
        noise_schedule: NoiseScheduleVP,
        algorithm_type: str = "data_prediction",
    ):
        assert algorithm_type in ("data_prediction", "noise_prediction")
        self.noise_fn = model_fn
        self.ns = noise_schedule
        self.predict_x0 = algorithm_type == "data_prediction"

    def model(self, x, t: float):
        if self.predict_x0:
            eps = self.noise_fn(x, t)
            alpha_t = float(self.ns.marginal_alpha(t))
            sigma_t = float(self.ns.marginal_std(t))
            return (x - sigma_t * eps) / alpha_t
        return self.noise_fn(x, t)

    # ------------------------------------------------------------------
    def _update_coeffs(
        self,
        *,
        order: int,
        tau: float,
        t_prev: Sequence[float],
        t: float,
        corrector: bool,
        few_steps: bool,
    ):
        """Host-side f64 coefficients of one Adams update.

        Returns (decay, coefs, noise_coef): the update is
          x' = decay * x + sum_i coefs[i] * model_prev[-(i+1)] + noise_coef * n
        where for the corrector the model list INCLUDES the predicted point.
        Shared by the unrolled path and the lax.scan fast path, so the two
        are coefficient-identical by construction. Spec :562-754.
        """
        ns = self.ns
        alpha_t = float(ns.marginal_alpha(t))
        sigma_t = float(ns.marginal_std(t))
        lam_t = float(ns.marginal_lambda(t))
        alpha_p = float(ns.marginal_alpha(t_prev[-1]))
        sigma_p = float(ns.marginal_std(t_prev[-1]))
        lam_p = float(ns.marginal_lambda(t_prev[-1]))
        h = lam_t - lam_p

        if corrector:
            t_list = list(t_prev) + [t]
        else:
            t_list = list(t_prev)
        lams = [float(ns.marginal_lambda(t_list[-(i + 1)])) for i in range(order)]
        gc = _gradient_coefficients(order, lam_p, lam_t, lams, tau, self.predict_x0)

        if few_steps and self.predict_x0 and order == 2:
            # UniPC-style O(h^3) correction (spec :667-681 / :726-737)
            s = 1 + tau**2
            if corrector:
                delta = math.exp(s * lam_t) * (
                    h / 2 - (h * s - 1 + math.exp(-s * h)) / (s**2 * h)
                )
            else:
                lam_p1 = float(ns.marginal_lambda(t_prev[-2]))
                delta = math.exp(s * lam_t) * (
                    h**2 / 2 - (h * s - 1 + math.exp(-s * h)) / s**2
                ) / (lam_p - lam_p1)
            gc = list(gc)
            gc[0] += delta
            gc[1] -= delta

        if self.predict_x0:
            coefs = [
                (1 + tau**2) * sigma_t * math.exp(-(tau**2) * lam_t) * g
                for g in gc
            ]
            noise_coef = sigma_t * math.sqrt(max(0.0, 1 - math.exp(-2 * tau**2 * h)))
            decay = math.exp(-(tau**2) * h) * (sigma_t / sigma_p)
        else:
            coefs = [-(1 + tau**2) * alpha_t * g for g in gc]
            noise_coef = tau * sigma_t * math.sqrt(max(0.0, math.exp(2 * h) - 1))
            decay = alpha_t / alpha_p
        return decay, coefs, noise_coef

    def _update(
        self,
        *,
        order: int,
        x,
        tau: float,
        model_prev: Sequence,
        t_prev: Sequence[float],
        noise,
        t: float,
        corrector: bool,
        few_steps: bool,
    ):
        """Adams-Bashforth (predictor) / Adams-Moulton (corrector) update."""
        decay, coefs, noise_coef = self._update_coeffs(
            order=order, tau=tau, t_prev=t_prev, t=t, corrector=corrector,
            few_steps=few_steps,
        )
        grad = jnp.zeros_like(x)
        for i in range(order):
            grad = grad + coefs[i] * model_prev[-(i + 1)]
        return decay * x + grad + noise_coef * noise

    # ------------------------------------------------------------------
    def sample_scan(
        self,
        x: jnp.ndarray,
        tau_fn,
        steps: int,
        rng: jax.Array,
        t_T: float,
        t_0: float,
        skip_type: str,
        skip_order: int,
    ) -> jnp.ndarray:
        """The production facade path (few_steps, PEC, predictor=corrector=2,
        data_prediction) as ONE lax.scan over per-step host-precomputed
        coefficients — a single model-call body in the compiled program
        instead of ~steps unrolled copies (~10x faster XLA compile at 25
        steps; coefficient-identical to the unrolled path because both use
        _update_coeffs)."""
        assert self.predict_x0 and steps >= 3
        ns = self.ns
        ts = [
            float(v)
            for v in sa_get_time_steps(ns, skip_type, t_T, t_0, steps, skip_order)
        ]
        rngs = jax.random.split(rng, steps + 1)
        dtype = x.dtype
        shape = x.shape

        model_prev0 = self.model(x, ts[0])

        # warmup (step 1): order-1 predictor, order-2 corrector — unrolled
        noise1 = jax.random.normal(rngs[1], shape, dtype)
        x_p = self._update(
            order=1, x=x, tau=tau_fn(ts[1]), model_prev=[model_prev0],
            t_prev=[ts[0]], noise=noise1, t=ts[1], corrector=False,
            few_steps=True,
        )
        m1 = self.model(x_p, ts[1])
        x = self._update(
            order=2, x=x, tau=tau_fn(ts[1]), model_prev=[model_prev0, m1],
            t_prev=[ts[0]], noise=noise1, t=ts[1], corrector=True,
            few_steps=True,
        )

        # uniform middle steps 2..steps-1: order-2 PEC, one model eval each
        rows = []
        for step in range(2, steps):
            t = ts[step]
            t_prev = [ts[step - 2], ts[step - 1]]
            pd, pc, pn = self._update_coeffs(
                order=2, tau=tau_fn(t), t_prev=t_prev, t=t, corrector=False,
                few_steps=True,
            )
            cd, cc, cn = self._update_coeffs(
                order=2, tau=tau_fn(t), t_prev=[ts[step - 1]], t=t,
                corrector=True, few_steps=True,
            )
            rows.append(
                (
                    pd, pc[0], pc[1], pn, cd, cc[0], cc[1], cn,
                    float(ns.marginal_alpha(t)), float(ns.marginal_std(t)), t,
                )
            )
        if rows:
            cols = [
                jnp.asarray(col, jnp.float32) for col in zip(*rows)
            ]
            keys = rngs[2:steps]

            def body(carry, inp):
                xi, mp1, mp2 = carry  # model_prev[-1], model_prev[-2]
                key, (pd, pc0, pc1, pn, cd, cc0, cc1, cn, a_t, s_t, t_c) = inp
                noise = jax.random.normal(key, shape, dtype)
                x_pred = pd * xi + pc0 * mp1 + pc1 * mp2 + pn * noise
                eps = self.noise_fn(x_pred, t_c)
                m_new = (x_pred - s_t * eps) / a_t  # data prediction
                x_new = cd * xi + cc0 * m_new + cc1 * mp1 + cn * noise
                return (x_new, m_new, mp1), None

            (x, m_last, m_prev), _ = jax.lax.scan(
                body, (x, m1, model_prev0), (keys, tuple(cols))
            )
        else:
            m_last, m_prev = m1, model_prev0

        # final step: tau=0 order-1 predictor, no model eval (few_steps)
        x = self._update(
            order=1, x=x, tau=0.0, model_prev=[m_last],
            t_prev=[ts[steps - 1]], noise=jnp.zeros_like(x), t=ts[steps],
            corrector=False, few_steps=True,
        )
        return x

    def sample(
        self,
        mode: str,
        x: jnp.ndarray,
        tau: TauFn,
        steps: int,
        rng: jax.Array,
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        skip_type: str = "time",
        skip_order: int = 1,
        predictor_order: int = 3,
        corrector_order: int = 4,
        pc_mode: str = "PEC",
        noise_fn: Optional[Callable] = None,  # (step_rng, shape, dtype) -> noise
        use_scan: bool = True,
    ) -> jnp.ndarray:
        """Spec: sample/sample_few_steps/sample_more_steps (:755-1097).

        few_steps: NFE == steps (no final correction, rescaling trick on).
        more_steps: NFE == steps + 2 (final correction + denoise to zero).
        """
        assert mode in ("few_steps", "more_steps")
        assert pc_mode in ("PEC", "PECE")
        few = mode == "few_steps"
        skip_final_step = few
        denoise_to_zero = not few
        tau_fn = tau if callable(tau) else (lambda _t: tau)

        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        assert steps >= max(predictor_order, corrector_order - 1)
        if (
            use_scan
            and few
            and pc_mode == "PEC"
            and predictor_order == 2
            and corrector_order == 2
            and self.predict_x0
            and steps >= 3
            and noise_fn is None
        ):
            return self.sample_scan(
                x, tau_fn, steps, rng, t_T, t_0, skip_type, skip_order
            )
        ts = [
            float(v)
            for v in sa_get_time_steps(self.ns, skip_type, t_T, t_0, steps, skip_order)
        ]
        rngs = list(jax.random.split(rng, steps + 1))
        if noise_fn is None:
            noise_fn = jax.random.normal

        t_prev = [ts[0]]
        model_prev = [self.model(x, ts[0])]

        warmup_end = max(predictor_order, corrector_order - 1)
        for step in range(1, warmup_end):
            t = ts[step]
            p_order = min(predictor_order, step)
            c_order = min(corrector_order, step + 1)
            noise = noise_fn(rngs[step], x.shape, x.dtype)
            x_p = self._update(
                order=p_order, x=x, tau=tau_fn(t), model_prev=model_prev,
                t_prev=t_prev, noise=noise, t=t, corrector=False, few_steps=few,
            )
            model_x = self.model(x_p, t)
            model_prev.append(model_x)
            if corrector_order > 0:
                x = self._update(
                    order=c_order, x=x, tau=tau_fn(t), model_prev=model_prev,
                    t_prev=t_prev, noise=noise, t=t, corrector=True, few_steps=few,
                )
                if pc_mode == "PECE":
                    model_prev[-1] = self.model(x, t)
            else:
                x = x_p
            t_prev.append(t)

        for step in range(warmup_end, steps + 1):
            t = ts[step]
            p_order = min(predictor_order, steps - step + 1)
            c_order = min(corrector_order, steps - step + 2)
            noise = noise_fn(rngs[step], x.shape, x.dtype)
            final = step == steps
            tau_here = 0.0 if (skip_final_step and final and not denoise_to_zero) else tau_fn(t)
            x_p = self._update(
                order=p_order, x=x, tau=tau_here, model_prev=model_prev,
                t_prev=t_prev, noise=noise, t=t, corrector=False, few_steps=few,
            )
            evaluate = (not skip_final_step) or step < steps
            if evaluate:
                model_prev.append(self.model(x_p, t))
            if corrector_order > 0 and evaluate:
                x = self._update(
                    order=c_order, x=x, tau=tau_fn(t), model_prev=model_prev,
                    t_prev=t_prev, noise=noise, t=t, corrector=True, few_steps=few,
                )
                if pc_mode == "PECE" and step < steps:
                    model_prev[-1] = self.model(x, t)
            else:
                x = x_p
            t_prev.append(t)
            del model_prev[0]

        if denoise_to_zero:
            # Final x0 projection — ALWAYS data prediction, even when the
            # solver runs in noise_prediction space (spec :420-425
            # denoise_to_zero_fn -> data_prediction_fn).
            eps = self.noise_fn(x, t_0)
            alpha_0 = float(self.ns.marginal_alpha(t_0))
            sigma_0 = float(self.ns.marginal_std(t_0))
            x = (x - sigma_0 * eps) / alpha_0
        return x


def sa_solver_sample(
    model_fn: ContinuousModelFn,
    betas: np.ndarray,
    x: jnp.ndarray,
    rng: jax.Array,
    steps: int = 25,
    eta: float = 1.0,
    **kwargs,
) -> jnp.ndarray:
    """SASolverSampler facade (sa_sampler.py:31-93): eta-tau schedule on
    t in [0.2, 0.8], few-steps PEC with predictor/corrector order 2."""
    ns = NoiseScheduleVP("discrete", betas=betas)
    solver = SASolver(model_fn, ns, algorithm_type="data_prediction")
    tau_fn = lambda t: eta if 0.2 <= t <= 0.8 else 0.0
    kwargs.setdefault("predictor_order", 2)
    kwargs.setdefault("corrector_order", 2)
    return solver.sample(
        "few_steps", x, tau_fn, steps, rng, skip_type="time", skip_order=1,
        pc_mode="PEC", **kwargs,
    )
