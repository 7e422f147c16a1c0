"""Parity of iDDPM q/p math, VLB, and training losses vs the torch reference.

Data layout note: ours is NHWC, the reference is NCHW; tests transpose at the
boundary. A deterministic analytic "model" (linear in x, t) makes the parity
exact without any weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
)
from tests.reference_shim import install_reference

install_reference()
from diffusion.model import gaussian_diffusion as ref_gd  # noqa: E402

B, H, W, C = 4, 8, 8, 4
RNG = np.random.RandomState(0)
X0_NP = RNG.randn(B, H, W, C).astype(np.float32)
NOISE_NP = RNG.randn(B, H, W, C).astype(np.float32)
T_NP = np.array([0, 1, 500, 999], dtype=np.int64)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


def fake_model_np(x_nhwc: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Deterministic learned-variance model: eps head 0.3x+0.001t, var head tanh."""
    tb = t.astype(np.float32).reshape(-1, 1, 1, 1)
    eps = 0.3 * x_nhwc + 0.001 * tb
    var = np.tanh(0.1 * x_nhwc)
    return np.concatenate([eps, var], axis=-1)


def make_pair(loss_type_ours, loss_type_ref, snr=False):
    betas = ref_gd.get_named_beta_schedule("linear", 1000)
    ours = GaussianDiffusion.create(
        betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=loss_type_ours,
        snr=snr,
    )
    ref = ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=loss_type_ref,
        snr=snr,
    )
    return ours, ref


def test_q_sample_and_posterior():
    ours, ref = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    xt_ours = ours.q_sample(jnp.asarray(X0_NP), jnp.asarray(T_NP), jnp.asarray(NOISE_NP))
    xt_ref = ref.q_sample(nchw(X0_NP), torch.from_numpy(T_NP), noise=nchw(NOISE_NP))
    np.testing.assert_allclose(np.asarray(xt_ours), nhwc(xt_ref), rtol=1e-5, atol=1e-5)

    m_o, v_o, lv_o = ours.q_posterior_mean_variance(
        jnp.asarray(X0_NP), xt_ours, jnp.asarray(T_NP)
    )
    m_r, v_r, lv_r = ref.q_posterior_mean_variance(nchw(X0_NP), nchw(np.asarray(xt_ours)), torch.from_numpy(T_NP))
    np.testing.assert_allclose(np.asarray(m_o), nhwc(m_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(v_o), (B, H, W, C)), nhwc(v_r.expand(B, C, H, W)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lv_o), (B, H, W, C)), nhwc(lv_r.expand(B, C, H, W)),
        rtol=1e-5, atol=1e-6,
    )


def test_p_mean_variance_learned_range():
    ours, ref = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    xt = ours.q_sample(jnp.asarray(X0_NP), jnp.asarray(T_NP), jnp.asarray(NOISE_NP))
    xt_np = np.asarray(xt)
    model_out = fake_model_np(xt_np, T_NP)

    out_ours = ours.p_mean_variance(
        jnp.asarray(model_out), xt, jnp.asarray(T_NP), clip_denoised=True
    )

    def ref_model(x, t, **kw):
        out = fake_model_np(nhwc(x), t.numpy())
        return nchw(out)

    out_ref = ref.p_mean_variance(
        ref_model, nchw(xt_np), torch.from_numpy(T_NP), clip_denoised=True
    )
    np.testing.assert_allclose(
        np.asarray(out_ours["mean"]), nhwc(out_ref["mean"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ours["log_variance"]), nhwc(out_ref["log_variance"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_ours["pred_xstart"]), nhwc(out_ref["pred_xstart"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize(
    "loss_ours,loss_ref,snr",
    [
        (LossType.MSE, ref_gd.LossType.MSE, False),
        (LossType.RESCALED_MSE, ref_gd.LossType.RESCALED_MSE, False),
        (LossType.MSE, ref_gd.LossType.MSE, True),
    ],
)
def test_training_losses(loss_ours, loss_ref, snr):
    ours, ref = make_pair(loss_ours, loss_ref, snr=snr)

    def model_fn(x, t):
        return jnp.asarray(fake_model_np(np.asarray(x), np.asarray(t)))

    terms = ours.training_losses(
        model_fn, jnp.asarray(X0_NP), jnp.asarray(T_NP), noise=jnp.asarray(NOISE_NP)
    )

    def ref_model(x, t, **kw):
        return nchw(fake_model_np(nhwc(x), t.numpy()))

    terms_ref = ref.training_losses(
        ref_model, nchw(X0_NP), torch.from_numpy(T_NP), noise=nchw(NOISE_NP)
    )
    np.testing.assert_allclose(
        np.asarray(terms["mse"]), terms_ref["mse"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(terms["vb"]), terms_ref["vb"].numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), terms_ref["loss"].numpy(), rtol=1e-3, atol=1e-5
    )


def test_p_sample_loop_runs_and_is_finite():
    ours, _ = make_pair(LossType.MSE, ref_gd.LossType.MSE)

    def model_fn(x, t):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    sample = jax.jit(
        lambda rng: ours.p_sample_loop(model_fn, (2, 8, 8, 4), rng)
    )(jax.random.PRNGKey(0))
    assert sample.shape == (2, 8, 8, 4)
    assert bool(jnp.isfinite(sample).all())
