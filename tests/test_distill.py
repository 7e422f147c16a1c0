"""LCM + DMD distillation step smoke tests with tiny models."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixart_sigma_tpu.diffusion import IDDPM
from pixart_sigma_tpu.models.lpips import LPIPS
from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.training import TrainState, build_optimizer
from pixart_sigma_tpu.training.dmd import make_dmd_train_steps
from pixart_sigma_tpu.training.lcm_trainer import make_lcm_train_step


def _setup():
    cfg = PixArtConfig(
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    B = 2
    latents = jnp.asarray(rng.randn(B, 8, 8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(B, 8, 32).astype(np.float32))
    uncond = jnp.asarray(rng.randn(B, 8, 32).astype(np.float32))
    mask = jnp.ones((B, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), latents, jnp.zeros((B,)), y, mask
    )["params"]
    # a fresh PixArt predicts eps == 0 (zero-init output head); randomise the
    # final layer so distillation losses are non-degenerate
    fl = params["final_layer"]["linear"]
    params["final_layer"]["linear"] = {
        "kernel": jax.random.normal(jax.random.PRNGKey(9), fl["kernel"].shape) * 0.1,
        "bias": jax.random.normal(jax.random.PRNGKey(10), fl["bias"].shape) * 0.01,
    }
    return model, params, latents, y, uncond, mask


def test_lcm_train_step():
    model, params, latents, y, uncond, mask = _setup()
    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True,
                      rescale_learned_sigmas=True)
    tx = build_optimizer(name="adamw", learning_rate=1e-4)
    state = TrainState.create(params=params, tx=tx, ema=True)
    teacher = jax.tree_util.tree_map(jnp.copy, params)
    step = make_lcm_train_step(model, diffusion, num_ddim_timesteps=10)
    batch = {"latents": latents, "y": y, "y_mask": mask}
    params0 = jax.tree_util.tree_map(jnp.copy, params)  # donation-safe copy
    s1, m1 = step(state, teacher, uncond, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, teacher, uncond, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2
    # target EMA moved toward the student
    d = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), s2.ema_params, params0
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_dmd_train_steps():
    model, params, latents, y, uncond, mask = _setup()
    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True,
                      rescale_learned_sigmas=True)
    gen_tx = optax.adamw(1e-4)
    fake_tx = optax.adamw(1e-4)
    gen_step, fake_step, one_step = make_dmd_train_steps(
        model, diffusion, start_ts=400,
        generator_tx=gen_tx, fake_tx=fake_tx,
    )
    gen_params = jax.tree_util.tree_map(jnp.copy, params)
    real_params = jax.tree_util.tree_map(jnp.copy, params)
    fake_params = jax.tree_util.tree_map(jnp.copy, params)
    gen_opt = gen_tx.init(gen_params)
    fake_opt = fake_tx.init(fake_params)

    rng = np.random.RandomState(1)
    batch = {
        "init_noise": jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)),
        "y": y, "y_mask": mask, "uncond_y": uncond,
    }
    gen_params2, gen_opt, metrics, x0 = gen_step(
        gen_params, gen_opt, real_params, fake_params, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(metrics["dm_loss"]))
    assert x0.shape == (2, 8, 8, 4)
    fake_params2, fake_opt, fmetrics = fake_step(
        fake_params, fake_opt, x0, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(fmetrics["sg_loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), gen_params, gen_params2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # 1-NFE generation entry point
    img_latents = one_step(gen_params2, batch["init_noise"], y, mask)
    assert img_latents.shape == (2, 8, 8, 4)


def test_lpips_shapes_and_zero_for_identical():
    lpips = LPIPS()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    params = lpips.init(jax.random.PRNGKey(0), x, x)
    d_same = lpips.apply(params, x, x)
    assert d_same.shape == (1,)
    assert abs(float(d_same[0])) < 1e-6
    y = x + 0.5
    d_diff = lpips.apply(params, x, y)
    assert float(d_diff[0]) > 0


def test_dreambooth_step():
    import optax

    from pixart_sigma_tpu.training.dreambooth import make_dreambooth_step
    from pixart_sigma_tpu.training.lora import init_lora_params

    model, params, latents, y, uncond, mask = _setup()
    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True,
                      rescale_learned_sigmas=True)
    lora = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora)
    step = make_dreambooth_step(
        model, diffusion, params, tx, with_prior_preservation=True
    )
    batch = {"latents": latents, "y": y, "y_mask": mask}  # B=2: 1 inst + 1 class
    lora2, opt_state, metrics = step(lora, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["prior"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), lora, lora2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
