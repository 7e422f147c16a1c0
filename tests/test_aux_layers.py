"""Auxiliary blocks + collectives: FinalLayer/MaskFinalLayer/DecoderLayer,
LabelEmbedder, CaptionEmbedderDoubleBr, ablation_sampler, dist helpers.

Reference specs: diffusion/model/nets/PixArt_blocks.py:184-257,348-378,
410-441; diffusion/model/edm_sample.py:54-171; diffusion/utils/dist_utils.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixart_sigma_tpu.models.layers import (
    CaptionEmbedderDoubleBr,
    DecoderLayer,
    FinalLayer,
    LabelEmbedder,
    MaskFinalLayer,
)


def test_final_layer_shapes_and_modulation():
    layer = FinalLayer(hidden_size=32, patch_size=2, out_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = layer.init(jax.random.PRNGKey(2), x, c)
    out = layer.apply(params, x, c)
    assert out.shape == (2, 5, 2 * 2 * 8)
    # conditioning must matter: different c -> different output
    out2 = layer.apply(params, x, c + 1.0)
    assert not np.allclose(out, out2)


def test_mask_final_layer_distinct_cond_width():
    layer = MaskFinalLayer(final_hidden_size=16, patch_size=2, out_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 16))
    t = jax.random.normal(jax.random.PRNGKey(1), (2, 48))  # c_emb_size != width
    params = layer.init(jax.random.PRNGKey(2), x, t)
    assert layer.apply(params, x, t).shape == (2, 7, 2 * 2 * 4)


def test_decoder_layer_projects_width():
    layer = DecoderLayer(hidden_size=16, decoder_hidden_size=24)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 16))
    t = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    params = layer.init(jax.random.PRNGKey(2), x, t)
    assert layer.apply(params, x, t).shape == (2, 7, 24)


def test_label_embedder_cfg_drop():
    emb = LabelEmbedder(num_classes=10, hidden_size=8, dropout_prob=0.5)
    labels = jnp.array([1, 2, 3, 4])
    params = emb.init(
        {"params": jax.random.PRNGKey(0), "label_drop": jax.random.PRNGKey(1)},
        labels, True,
    )
    # table has the extra null row
    assert params["params"]["embedding_table"]["embedding"].shape == (11, 8)
    # force-drop all -> every row equals the null embedding
    out = emb.apply(params, labels, False, force_drop_ids=jnp.ones(4, jnp.int32))
    null = params["params"]["embedding_table"]["embedding"][10]
    np.testing.assert_allclose(out, np.tile(null, (4, 1)), rtol=1e-6)
    # no-drop eval path uses the real rows
    out = emb.apply(params, labels, False)
    np.testing.assert_allclose(
        out, params["params"]["embedding_table"]["embedding"][np.array(labels)],
        rtol=1e-6,
    )


def test_caption_embedder_double_br_branches():
    emb = CaptionEmbedderDoubleBr(
        in_channels=12, hidden_size=16, uncond_prob=0.5, token_num=6
    )
    cap = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 6, 12))
    params = emb.init(
        {"params": jax.random.PRNGKey(1), "caption_drop": jax.random.PRNGKey(2)},
        cap, True,
    )
    y_embed, caption = emb.apply(params, cap, False)
    assert y_embed.shape == (3, 16)
    assert caption.shape == (3, 1, 6, 12)
    # forced drop: caption replaced by the learned per-token null
    y2, cap2 = emb.apply(params, cap, False, force_drop_ids=jnp.ones(3, jnp.int32))
    np.testing.assert_allclose(
        cap2[0, 0], params["params"]["y_embedding"], rtol=1e-6
    )
    assert not np.allclose(y_embed, y2)


# --------------------------------------------------------------------------
# ablation_sampler
# --------------------------------------------------------------------------

def _toy_denoiser(x, sigma):
    # analytic denoiser of N(0, I) data: D(x, sigma) = x / (1 + sigma^2)
    return x / (1.0 + sigma**2)


def test_ablation_sampler_matches_edm_heun():
    """With edm discretization / linear schedule / no scaling, the ablation
    sampler must reproduce the dedicated Heun edm_sampler."""
    from pixart_sigma_tpu.diffusion.edm import ablation_sampler, edm_sampler

    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    a = edm_sampler(_toy_denoiser, latents, jax.random.PRNGKey(1), num_steps=8)
    b = ablation_sampler(
        _toy_denoiser, latents, jax.random.PRNGKey(1), num_steps=8,
        solver="heun", discretization="edm", schedule="linear", scaling="none",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "disc,sched,scal",
    [("vp", "vp", "vp"), ("ve", "ve", "none"), ("iddpm", "linear", "none")],
)
def test_ablation_sampler_modes_finite(disc, sched, scal):
    from pixart_sigma_tpu.diffusion.edm import ablation_sampler

    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    out = ablation_sampler(
        _toy_denoiser, latents, jax.random.PRNGKey(1), num_steps=6,
        solver="euler", discretization=disc, schedule=sched, scaling=scal,
    )
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()
    # samples should have contracted toward the unit-variance data manifold
    assert np.abs(np.asarray(out)).max() < 50


# --------------------------------------------------------------------------
# dist helpers
# --------------------------------------------------------------------------

def test_all_gather_tensor_differentiable():
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from pixart_sigma_tpu.parallel.dist import all_gather_tensor

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    @partial(
        shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(),
        check_rep=False,
    )
    def gather_sum(x):
        return jnp.sum(all_gather_tensor(x, "dp") ** 2)

    x = jnp.arange(16, dtype=jnp.float32)
    val, grad = jax.value_and_grad(lambda x: gather_sum(x))(x)
    np.testing.assert_allclose(val, np.sum(np.arange(16.0) ** 2), rtol=1e-6)
    np.testing.assert_allclose(grad, 2 * np.arange(16.0), rtol=1e-6)


def test_reduce_dict_pmean():
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from pixart_sigma_tpu.parallel.dist import reduce_dict

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
    def mean_loss(x):
        local = {"loss": jnp.mean(x, keepdims=True)}
        return reduce_dict(local, "dp")["loss"]

    x = jnp.arange(8, dtype=jnp.float32)
    np.testing.assert_allclose(mean_loss(x), [3.5], rtol=1e-6)


def test_find_model_local_paths(tmp_path):
    from pixart_sigma_tpu.utils.checkpoint import find_model

    with pytest.raises(FileNotFoundError):
        find_model(str(tmp_path / "nope.pth"))

    import torch

    p = tmp_path / "ckpt.pth"
    torch.save({"state_dict": {"w": torch.ones(2, 2)}}, p)
    sd = find_model(str(p))
    np.testing.assert_allclose(sd["w"], np.ones((2, 2)))
