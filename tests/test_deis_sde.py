"""DEIS multistep + SDE-DPM-Solver validation.

Reference surface: /root/reference/scripts/inference_pipeline.py:144-146
offers DEISMultistepScheduler and sde-dpmsolver(++) via diffusers (not
importable offline), so validation is mathematical rather than golden:

- DEIS order-1 is analytically identical to DPM-Solver order-1 (both are
  the exact exponential-integrator / DDIM step) — checked to fp tolerance.
- Higher DEIS orders must converge to the same probability-flow ODE
  solution as DPM-Solver++ on a smooth analytic model, with error
  decreasing in both order and step count.
- The SDE samplers are checked on a 1-D linear-Gaussian problem where the
  OPTIMAL eps-predictor is closed-form: the reverse SDE must reproduce the
  data distribution's mean/std (a drift-or-diffusion-scaling bug shifts
  both immediately).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixart_sigma_tpu.diffusion.deis import DEISMultistep
from pixart_sigma_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP
from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule

BETAS = named_beta_schedule("linear", 1000)


def _ns():
    return NoiseScheduleVP("discrete", betas=BETAS)


def _smooth_model(ns):
    """Analytic eps model: smooth in (x, t), nontrivial trajectories."""

    def fn(x, t):
        return 0.4 * jnp.tanh(x) + 0.6 * jnp.sin(3.0 * t) * jnp.ones_like(x)

    return fn


def test_deis_order1_equals_dpmsolver_order1():
    ns = _ns()
    fn = _smooth_model(ns)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    deis = DEISMultistep(fn, ns).sample(x, steps=12, order=1)
    dpm = DPMSolver(fn, ns, algorithm_type="dpmsolver").sample(
        x, steps=12, order=1, method="multistep", use_scan=False)
    np.testing.assert_allclose(
        np.asarray(deis), np.asarray(dpm), rtol=2e-5, atol=2e-5)


def test_deis_higher_orders_converge_to_ode_solution():
    ns = _ns()
    fn = _smooth_model(ns)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 6, 4)),
                    jnp.float32)
    # high-resolution reference solution of the same ODE
    ref = DPMSolver(fn, ns, algorithm_type="dpmsolver++").sample(
        x, steps=200, order=2, method="multistep", use_scan=False)
    ref = np.asarray(ref)

    def err(order, steps):
        out = DEISMultistep(fn, ns).sample(x, steps=steps, order=order)
        return float(np.max(np.abs(np.asarray(out) - ref)))

    # error decreases with steps and with order (the tanh feedback makes
    # this ODE stiff — even DPM++ order-2 needs ~200 steps for 1e-2 max
    # error, so convergence to the shared limit is the meaningful check)
    assert err(2, 40) < err(2, 10) < err(1, 10)
    assert err(3, 20) < err(2, 10)
    assert err(2, 200) < 0.05


@pytest.mark.parametrize("algo", ["sde-dpmsolver", "sde-dpmsolver++"])
@pytest.mark.parametrize("order", [1, 2])
def test_sde_sampler_reproduces_gaussian_data(algo, order):
    """Exact eps-predictor for x0 ~ N(mu, s^2): the reverse SDE must map
    N(0,1) noise back to N(mu, s^2)."""
    ns = _ns()
    mu, s = 1.5, 0.5

    def optimal_eps(x, t):
        alpha = ns.marginal_alpha(t)
        sigma = ns.marginal_std(t)
        x0_hat = (alpha * s**2 * x + sigma**2 * mu) / (
            alpha**2 * s**2 + sigma**2)
        return (x - alpha * x0_hat) / sigma

    n = 8192
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 1))
    solver = DPMSolver(optimal_eps, ns, algorithm_type=algo)
    out = np.asarray(solver.sample_sde(
        x, jax.random.PRNGKey(1), steps=60, order=order))
    assert abs(out.mean() - mu) < 0.05, (algo, order, out.mean())
    assert abs(out.std() - s) < 0.05, (algo, order, out.std())


def test_sde_sample_guard():
    ns = _ns()
    solver = DPMSolver(_smooth_model(ns), ns, algorithm_type="sde-dpmsolver++")
    with pytest.raises(ValueError, match="sample_sde"):
        solver.sample(jnp.zeros((1, 4, 4, 4)), steps=5)


def test_karras_skip_type():
    """rho-7 karras spacing (reference --karras) is monotone, spans
    [t_0, t_T], and the trajectory still converges on the smooth model."""
    from pixart_sigma_tpu.diffusion.dpm_solver import get_time_steps

    ns = _ns()
    ts = get_time_steps(ns, "karras", ns.T, 1.0 / 1000, 20)
    assert ts.shape == (21,)
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_allclose(ts[0], ns.T, rtol=1e-6)
    np.testing.assert_allclose(ts[-1], 1.0 / 1000, rtol=1e-4, atol=1e-6)
    # karras clusters steps at low noise: the last interval is much finer
    assert abs(ts[-1] - ts[-2]) < abs(ts[0] - ts[1]) / 3

    fn = _smooth_model(ns)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 4, 4)),
                    jnp.float32)
    ref = np.asarray(DPMSolver(fn, ns, algorithm_type="dpmsolver++").sample(
        x, steps=200, order=2, method="multistep", use_scan=False))
    out = np.asarray(DPMSolver(fn, ns, algorithm_type="dpmsolver++").sample(
        x, steps=100, order=2, method="multistep", skip_type="karras",
        use_scan=False))
    assert float(np.max(np.abs(out - ref))) < 0.2
