"""Golden parity: SASolverScheduler vs the reference diffusers port.

Drives /root/reference/diffusion/sa_solver_diffusers.py (via the shim) and
our pixart_sigma_tpu.diffusion.sa_solver_scheduler step-by-step with the
SAME injected noise and a deterministic fake model; trajectories must match
to f32 tolerance.
"""

import numpy as np
import pytest

from reference_shim import install_reference

install_reference()

import torch  # noqa: E402

from pixart_sigma_tpu.diffusion.sa_solver_scheduler import (  # noqa: E402
    SASolverScheduler,
)


def _ref_module():
    import importlib

    return importlib.import_module("diffusion.sa_solver_diffusers")


def _fake_model(sample, t):
    # deterministic pseudo-eps: mixes the sample with a t-dependent pattern
    base = np.sin(np.arange(sample.size, dtype=np.float64) + float(t) * 0.1)
    return (0.3 * np.asarray(sample, np.float64)
            + 0.7 * base.reshape(sample.shape))


@pytest.mark.parametrize("algorithm_type", ["data_prediction",
                                            "noise_prediction"])
@pytest.mark.parametrize("tau", [0.0, 1.0])
def test_scheduler_matches_reference(algorithm_type, tau):
    ref_mod = _ref_module()
    steps, shape = 8, (1, 4, 4, 2)
    rng = np.random.default_rng(0)
    noises = [rng.standard_normal(shape).astype(np.float32)
              for _ in range(steps)]
    noise_queue = list(noises)
    ref_mod.randn_tensor = lambda *a, **k: torch.from_numpy(
        noise_queue.pop(0)).to(k.get("dtype") or torch.float32)

    kwargs = dict(
        num_train_timesteps=1000, beta_schedule="linear",
        predictor_order=2, corrector_order=2,
        algorithm_type=algorithm_type, tau_func=lambda t: tau,
    )
    ref = ref_mod.SASolverScheduler(**kwargs)
    ours = SASolverScheduler(**kwargs)

    ref.set_timesteps(steps)
    ours.set_timesteps(steps)
    np.testing.assert_array_equal(
        np.asarray(ref.timesteps), np.asarray(ours.timesteps))

    x_ref = torch.from_numpy(rng.standard_normal(shape).astype(np.float32))
    x_our = np.asarray(x_ref.numpy())
    for i, t in enumerate(np.asarray(ours.timesteps)):
        eps = _fake_model(x_our, t).astype(np.float32)
        out_ref = ref.step(torch.from_numpy(eps), int(t), x_ref).prev_sample
        out_our = ours.step(eps, int(t), x_our, noise=noises[i]).prev_sample
        x_ref = out_ref
        x_our = np.asarray(out_our)
        np.testing.assert_allclose(
            x_our, x_ref.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"step {i} (t={t})")


def test_scheduler_timestep_spacings_and_karras():
    for spacing in ("linspace", "leading", "trailing"):
        s = SASolverScheduler(timestep_spacing=spacing)
        s.set_timesteps(10)
        ts = np.asarray(s.timesteps)
        assert (np.diff(ts) < 0).all()
        assert ts.min() >= 0 and ts.max() < 1000
    k = SASolverScheduler(use_karras_sigmas=True)
    k.set_timesteps(10)
    ts = np.asarray(k.timesteps)
    assert (np.diff(ts) < 0).all() and len(ts) == 10


def test_scheduler_add_noise_and_v_prediction():
    s = SASolverScheduler(prediction_type="v_prediction")
    s.set_timesteps(5)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    n = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    xt = np.asarray(s.add_noise(x0, n, np.asarray([100, 500])))
    a = s.alpha_t[[100, 500]].reshape(-1, 1, 1, 1)
    sg = s.sigma_t[[100, 500]].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(xt, a * x0 + sg * n, rtol=1e-5, atol=1e-5)
    # v-pred conversion: v = alpha*eps - sigma*x0 inverts to x0
    t = 300
    v = s.alpha_t[t] * n[:1] - s.sigma_t[t] * x0[:1]
    xt1 = s.alpha_t[t] * x0[:1] + s.sigma_t[t] * n[:1]
    np.testing.assert_allclose(
        np.asarray(s.convert_model_output(v, t, xt1)), x0[:1],
        rtol=1e-4, atol=1e-4)
