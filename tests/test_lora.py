"""LoRA/DoRA surgery tests: zero-init identity, training moves only adapters."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixart_sigma_tpu.diffusion import IDDPM
from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.training.lora import (
    apply_lora,
    count_lora_params,
    init_lora_params,
    make_lora_train_step,
    merge_lora,
)


def _setup():
    cfg = PixArtConfig(
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), y, mask)["params"]
    return model, params, (x, jnp.asarray([5.0, 99.0]), y, mask)


def test_lora_zero_init_is_identity():
    model, params, (x, t, y, mask) = _setup()
    lora = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))
    assert count_lora_params(lora) > 0
    merged = apply_lora(params, lora, scale=1.0)
    out_base = model.apply({"params": params}, x, t, y, mask)
    out_lora = model.apply({"params": merged}, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_lora), atol=1e-6)


def test_dora_zero_init_is_identity():
    model, params, (x, t, y, mask) = _setup()
    lora = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1), use_dora=True)
    merged = apply_lora(params, lora)
    out_base = model.apply({"params": params}, x, t, y, mask)
    out_lora = model.apply({"params": merged}, x, t, y, mask)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_lora), rtol=1e-5, atol=1e-5
    )


def test_lora_training_step_moves_only_adapters():
    model, params, (x, t, y, mask) = _setup()
    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True,
                      rescale_learned_sigmas=True)
    lora = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora)
    step = make_lora_train_step(model, diffusion, params, tx)
    batch = {"latents": x, "y": y, "y_mask": mask}
    lora2, opt_state, loss1 = step(lora, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss1))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), lora, lora2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # merged export keeps working
    final = merge_lora(params, lora2)
    out = model.apply({"params": final}, x, t, y, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_scan_layout_gets_per_layer_adapters():
    model, params, _ = _setup()
    lora = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(1))
    # blocks are stacked [L=2, ...] in scan layout: adapters must carry L too
    key = next(k for k in lora if "blocks_scan_0" in k and k.endswith("qkv"))
    assert lora[key]["a"].shape[0] == 2
