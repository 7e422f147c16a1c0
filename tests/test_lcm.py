"""LCM scheduler parity vs the reference (timesteps, scalings, full loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.diffusion.lcm import (
    DDIMSolver,
    LCMScheduler,
    lcm_inference_timesteps,
    scalings_for_boundary_conditions,
)
from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule
from tests.reference_shim import install_reference

install_reference()
from diffusion import lcm_scheduler as ref_lcm  # noqa: E402

FAKE_W = np.random.RandomState(7).randn(4, 4).astype(np.float32) * 0.1


def test_timesteps_match():
    ref = ref_lcm.LCMScheduler()
    for steps, origin in [(1, 50), (2, 50), (4, 50), (8, 40)]:
        ref.set_timesteps(steps, origin)
        ours = lcm_inference_timesteps(steps, origin)
        np.testing.assert_array_equal(ours, ref.timesteps.numpy())


def test_boundary_scalings_match():
    ref = ref_lcm.LCMScheduler()
    for t in [19, 399, 999]:
        c_skip_ref, c_out_ref = ref.get_scalings_for_boundary_condition_discrete(t)
        c_skip, c_out = scalings_for_boundary_conditions(np.float64(t))
        assert c_skip == pytest.approx(float(c_skip_ref), rel=1e-6)
        assert c_out == pytest.approx(float(c_out_ref), rel=1e-6)


def test_lcm_loop_matches_reference():
    """Multi-step LCM with zero variance noise matches the reference steps."""
    B, D = 2, 4
    x0 = np.random.RandomState(8).randn(B, D).astype(np.float32)
    steps, origin = 4, 50

    def eps_np(x, t_scalar):
        return np.tanh(x @ FAKE_W) * (1.0 + t_scalar / 2000.0)

    # reference loop (mirrors app_pixart_dmd-style usage; zero noise)
    ref = ref_lcm.LCMScheduler()
    ref.set_timesteps(steps, origin)
    torch_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(*a)  # deterministic
    try:
        x = torch.from_numpy(x0.copy())
        for i, t in enumerate(ref.timesteps):
            eps = torch.from_numpy(eps_np(x.numpy(), float(t)))
            x, denoised = ref.step(eps, i, int(t), x, return_dict=False)
        want = denoised.numpy()
    finally:
        torch.randn = torch_randn

    ours = LCMScheduler()

    def model_fn(x, t_vec):
        return jnp.tanh(x @ FAKE_W) * (1.0 + t_vec[0] / 2000.0)

    # zero out the re-noising by monkeypatching normal via rng-independent fold
    import pixart_sigma_tpu.diffusion.lcm as lcm_mod

    orig_normal = jax.random.normal
    jax.random.normal = lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    try:
        got = ours.sample(
            model_fn, (B, D), jax.random.PRNGKey(0),
            num_inference_steps=steps, lcm_origin_steps=origin,
            noise=jnp.asarray(x0),
        )
    finally:
        jax.random.normal = orig_normal

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-6)


def test_ddim_solver_matches_reference_formula():
    betas = named_beta_schedule("linear", 1000)
    acp = np.cumprod(1 - betas)
    solver = DDIMSolver(acp, 1000, 50)
    # reference formula (train_pixart_lcm.py:98-104)
    idx = jnp.asarray([0, 10, 49])
    x0 = jnp.ones((3, 4))
    eps = jnp.full((3, 4), 0.5)
    got = solver.ddim_step(x0, eps, idx)
    acp_prev = np.concatenate([acp[:1], acp[solver.ddim_timesteps[:-1]]])[[0, 10, 49]]
    want = (
        np.sqrt(acp_prev)[:, None] * np.asarray(x0)
        + np.sqrt(1 - acp_prev)[:, None] * np.asarray(eps)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
