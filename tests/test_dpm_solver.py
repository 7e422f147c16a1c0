"""Parity of DPM-Solver++ (schedule + full multistep trajectory) vs reference.

Uses a deterministic analytic noise model so trajectories are exactly
comparable between the torch reference and our jitted JAX version.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.diffusion.dpm_solver import (
    DPMSolver,
    NoiseScheduleVP,
    get_time_steps,
)
from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule
from tests.reference_shim import install_reference

install_reference()
from diffusion.model import dpm_solver as ref_dpm  # noqa: E402

BETAS = named_beta_schedule("linear", 1000)


def ref_schedule(dtype=torch.float32):
    return ref_dpm.NoiseScheduleVP(
        "discrete", betas=torch.tensor(BETAS, dtype=torch.float64), dtype=dtype
    )


def test_noise_schedule_marginals_match():
    ours = NoiseScheduleVP("discrete", betas=BETAS)
    ref = ref_schedule()
    ts = np.linspace(1.0 / 1000, 1.0, 57)
    for fn_o, fn_r in [
        (ours.marginal_log_mean_coeff, ref.marginal_log_mean_coeff),
        (ours.marginal_std, ref.marginal_std),
        (ours.marginal_lambda, ref.marginal_lambda),
    ]:
        got = fn_o(ts)
        want = fn_r(torch.tensor(ts, dtype=torch.float64)).numpy()
        # reference stores its log-alpha table in float32; ours is float64
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_inverse_lambda_roundtrip():
    ours = NoiseScheduleVP("discrete", betas=BETAS)
    ts = np.linspace(1.0 / 1000, 1.0, 31)
    lam = ours.marginal_lambda(ts)
    back = ours.inverse_lambda(lam)
    np.testing.assert_allclose(back, ts, rtol=1e-8, atol=1e-10)


def test_time_steps_match():
    ours = NoiseScheduleVP("discrete", betas=BETAS)
    ref = ref_schedule()
    solver_ref = ref_dpm.DPM_Solver(lambda x, t: x, ref, algorithm_type="dpmsolver++")
    for skip in ["time_uniform", "logSNR", "time_quadratic"]:
        got = get_time_steps(ours, skip, 1.0, 1e-3, 20)
        want = solver_ref.get_time_steps(skip, 1.0, 1e-3, 20, "cpu").numpy()
        # logSNR inversion goes through the reference's float32 table
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-6)


FAKE_W = np.random.RandomState(1).randn(4, 4).astype(np.float64) * 0.1


def analytic_eps_np(x, t_scalar):
    """eps(x, t) = tanh(x @ W) * (1 + t/2000) — bounded so trajectories stay O(1)."""
    scale = 1.0 + t_scalar / 2000.0
    return np.tanh(x @ FAKE_W) * scale


@pytest.mark.parametrize("order,steps", [(2, 20), (2, 5), (3, 12), (1, 10)])
def test_multistep_trajectory_matches_reference(order, steps):
    B, D = 2, 4
    x0 = np.random.RandomState(2).randn(B, D).astype(np.float64)

    # --- reference trajectory (float64 torch) ---
    ref = ref_schedule(dtype=torch.float64)

    def ref_model(x, t_cont):
        # reference wraps model(x, t_input) via model_wrapper; emulate directly
        t_input = (t_cont - 1.0 / ref.total_N) * 1000.0
        return torch.from_numpy(
            analytic_eps_np(x.numpy(), float(t_input[0]))
        )

    solver_ref = ref_dpm.DPM_Solver(ref_model, ref, algorithm_type="dpmsolver++")
    want = solver_ref.sample(
        torch.from_numpy(x0),
        steps=steps,
        order=order,
        skip_type="time_uniform",
        method="multistep",
        lower_order_final=True,
    ).numpy()

    # --- ours (jitted; f64 so the formula parity check is exact) ---
    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = ns.model_input_time(t_cont)
        return jnp.tanh(x @ FAKE_W) * (1.0 + t_input / 2000.0)

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    with jax.enable_x64(True):
        got = jax.jit(
            lambda x: solver.sample(x, steps=steps, order=order, method="multistep")
        )(jnp.asarray(x0, dtype=jnp.float64))

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("order,steps", [(2, 20), (2, 5), (1, 10)])
def test_scan_path_matches_unrolled(order, steps):
    """The lax.scan sampling path must match the unrolled path exactly."""
    B, D = 2, 4
    x0 = jnp.asarray(
        np.random.RandomState(3).randn(B, D).astype(np.float32)
    )
    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = (jnp.asarray(t_cont, jnp.float32) - 1.0 / ns.total_N) * 1000.0
        return jnp.tanh(x @ FAKE_W.astype(np.float32)) * (1.0 + t_input / 2000.0)

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    got_scan = jax.jit(
        lambda x: solver.sample(x, steps=steps, order=order, use_scan=True)
    )(x0)
    got_unrolled = jax.jit(
        lambda x: solver.sample(x, steps=steps, order=order, use_scan=False)
    )(x0)
    np.testing.assert_allclose(
        np.asarray(got_scan), np.asarray(got_unrolled), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("order,steps", [(2, 10), (3, 12), (1, 8)])
def test_singlestep_matches_reference(order, steps):
    B, D = 2, 4
    x0 = np.random.RandomState(13).randn(B, D).astype(np.float64)
    ref = ref_schedule(dtype=torch.float64)

    def ref_model(x, t_cont):
        t_input = (t_cont - 1.0 / ref.total_N) * 1000.0
        return torch.tanh(x @ torch.from_numpy(FAKE_W)) * (1.0 + t_input[0] / 2000.0)

    solver_ref = ref_dpm.DPM_Solver(ref_model, ref, algorithm_type="dpmsolver++")
    want = solver_ref.sample(
        torch.from_numpy(x0), steps=steps, order=order,
        skip_type="time_uniform", method="singlestep",
    ).numpy()

    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = (jnp.asarray(t_cont) - 1.0 / ns.total_N) * 1000.0
        return jnp.tanh(x @ FAKE_W) * (1.0 + t_input / 2000.0)

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    with jax.enable_x64(True):
        got = solver.sample(
            jnp.asarray(x0), steps=steps, order=order, method="singlestep"
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("order", [2, 3])
def test_adaptive_trajectory_matches_reference(order):
    """Adaptive step-size solver (lax.while_loop) vs the reference's host
    python loop (dpm_solver.py:970-1031), float64 both sides so the
    accept/reject decisions agree exactly."""
    B, D = 2, 4
    x0 = np.random.RandomState(7).randn(B, D).astype(np.float64)

    ref = ref_schedule(dtype=torch.float64)

    def ref_model(x, t_cont):
        t_input = (t_cont - 1.0 / ref.total_N) * 1000.0
        return torch.tanh(x @ torch.from_numpy(FAKE_W)) * (
            1.0 + t_input.reshape(-1)[0] / 2000.0
        )

    solver_ref = ref_dpm.DPM_Solver(ref_model, ref, algorithm_type="dpmsolver++")
    want = solver_ref.dpm_solver_adaptive(
        torch.from_numpy(x0), order, ref.T, 1.0 / ref.total_N
    ).numpy()

    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = (jnp.asarray(t_cont) - 1.0 / ns.total_N) * 1000.0
        return jnp.tanh(x @ FAKE_W) * (1.0 + t_input / 2000.0)

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    with jax.enable_x64(True):
        got, nfe = jax.jit(
            lambda x: solver.sample_adaptive(x, order=order, return_nfe=True)
        )(jnp.asarray(x0))
    assert int(nfe) > 0 and int(nfe) % order == 0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_adaptive_via_sample_method():
    """sample(method='adaptive') routes to the while_loop solver (f32)."""
    B, D = 2, 4
    x0 = jnp.asarray(np.random.RandomState(8).randn(B, D).astype(np.float32))
    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = (jnp.asarray(t_cont, jnp.float32) - 1.0 / ns.total_N) * 1000.0
        return jnp.tanh(x @ FAKE_W.astype(np.float32)) * (1.0 + t_input / 2000.0)

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    got = jax.jit(lambda x: solver.sample(x, order=2, method="adaptive"))(x0)
    direct = jax.jit(lambda x: solver.sample_adaptive(x, order=2))(x0)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), rtol=1e-6)


def test_adaptive_bf16_carry():
    """Regression: the while_loop carry must stay dtype-stable for bf16 x."""
    B, D = 2, 4
    x0 = jnp.asarray(
        np.random.RandomState(9).randn(B, D).astype(np.float32), jnp.bfloat16
    )
    ns = NoiseScheduleVP("discrete", betas=BETAS)

    def model_fn(x, t_cont):
        t_input = (jnp.asarray(t_cont, jnp.float32) - 1.0 / ns.total_N) * 1000.0
        return jnp.tanh(x.astype(jnp.float32) @ FAKE_W.astype(np.float32)) * (
            1.0 + t_input / 2000.0
        )

    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
    got = jax.jit(lambda x: solver.sample_adaptive(x, order=2))(x0)
    assert got.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(got, np.float32)).all()
