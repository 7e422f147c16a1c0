"""Checkpoint round-trips: .pth <-> flax <-> diffusers, orbax save/restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.utils.checkpoint import (
    diffusers_to_torch_state_dict,
    flax_to_torch_state_dict,
    latest_checkpoint,
    load_checkpoint,
    restore_train_state,
    save_train_state,
    torch_to_flax_params,
)


def _cfg(**kw):
    base = dict(
        depth=3, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32, qk_norm=True,
        kv_compress_sampling="conv", kv_compress_scale=2,
        kv_compress_layers=(2,),
    )
    base.update(kw)
    return PixArtConfig(**base)


def _init_params(cfg):
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 8, 32).astype(np.float32))
    return model, model.init(
        jax.random.PRNGKey(3), x, jnp.zeros((1,)), y, jnp.ones((1, 8), jnp.int32)
    )["params"]


def test_pth_roundtrip_preserves_forward():
    cfg = _cfg(scan_blocks=False)
    model, params = _init_params(cfg)
    sd = flax_to_torch_state_dict(params, cfg)
    params2 = torch_to_flax_params(sd, cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    t = jnp.asarray([3.0, 800.0])
    mask = jnp.ones((2, 8), jnp.int32)
    out1 = model.apply({"params": params}, x, t, y, mask)
    out2 = model.apply({"params": params2}, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_pth_roundtrip_scan_layout():
    cfg = _cfg(scan_blocks=True)
    model, params = _init_params(cfg)
    sd = flax_to_torch_state_dict(params, cfg)
    params2 = torch_to_flax_params(sd, cfg)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=0)


def test_pth_file_and_diffusers_mapping(tmp_path):
    cfg = _cfg(scan_blocks=False, qk_norm=False, kv_compress_sampling=None,
               kv_compress_layers=())
    model, params = _init_params(cfg)
    sd = flax_to_torch_state_dict(params, cfg)
    pth = tmp_path / "epoch_1_step_10.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        str(pth),
    )
    loaded = load_checkpoint(str(pth), cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # diffusers naming round-trip: build dsd from sd via the forward map logic
    dsd = {}
    dsd["pos_embed.proj.weight"] = sd["x_embedder.proj.weight"]
    dsd["pos_embed.proj.bias"] = sd["x_embedder.proj.bias"]
    for a, b in (("linear_1", "fc1"), ("linear_2", "fc2")):
        dsd[f"caption_projection.{a}.weight"] = sd[f"y_embedder.y_proj.{b}.weight"]
        dsd[f"caption_projection.{a}.bias"] = sd[f"y_embedder.y_proj.{b}.bias"]
    dsd["caption_projection.y_embedding"] = sd["y_embedder.y_embedding"]
    for a, b in (("linear_1", "mlp.0"), ("linear_2", "mlp.2")):
        dsd[f"adaln_single.emb.timestep_embedder.{a}.weight"] = sd[f"t_embedder.{b}.weight"]
        dsd[f"adaln_single.emb.timestep_embedder.{a}.bias"] = sd[f"t_embedder.{b}.bias"]
    dsd["adaln_single.linear.weight"] = sd["t_block.1.weight"]
    dsd["adaln_single.linear.bias"] = sd["t_block.1.bias"]
    dsd["proj_out.weight"] = sd["final_layer.linear.weight"]
    dsd["proj_out.bias"] = sd["final_layer.linear.bias"]
    dsd["scale_shift_table"] = sd["final_layer.scale_shift_table"]
    for i in range(cfg.depth):
        t, b = f"transformer_blocks.{i}", f"blocks.{i}"
        dsd[f"{t}.scale_shift_table"] = sd[f"{b}.scale_shift_table"]
        qw, kw_, vw = np.split(sd[f"{b}.attn.qkv.weight"], 3, axis=0)
        qb, kb, vb = np.split(sd[f"{b}.attn.qkv.bias"], 3, axis=0)
        for n, w_, b_ in (("q", qw, qb), ("k", kw_, kb), ("v", vw, vb)):
            dsd[f"{t}.attn1.to_{n}.weight"] = w_
            dsd[f"{t}.attn1.to_{n}.bias"] = b_
        dsd[f"{t}.attn1.to_out.0.weight"] = sd[f"{b}.attn.proj.weight"]
        dsd[f"{t}.attn1.to_out.0.bias"] = sd[f"{b}.attn.proj.bias"]
        dsd[f"{t}.attn2.to_q.weight"] = sd[f"{b}.cross_attn.q_linear.weight"]
        dsd[f"{t}.attn2.to_q.bias"] = sd[f"{b}.cross_attn.q_linear.bias"]
        kw2, vw2 = np.split(sd[f"{b}.cross_attn.kv_linear.weight"], 2, axis=0)
        kb2, vb2 = np.split(sd[f"{b}.cross_attn.kv_linear.bias"], 2, axis=0)
        dsd[f"{t}.attn2.to_k.weight"], dsd[f"{t}.attn2.to_v.weight"] = kw2, vw2
        dsd[f"{t}.attn2.to_k.bias"], dsd[f"{t}.attn2.to_v.bias"] = kb2, vb2
        dsd[f"{t}.attn2.to_out.0.weight"] = sd[f"{b}.cross_attn.proj.weight"]
        dsd[f"{t}.attn2.to_out.0.bias"] = sd[f"{b}.cross_attn.proj.bias"]
        dsd[f"{t}.ff.net.0.proj.weight"] = sd[f"{b}.mlp.fc1.weight"]
        dsd[f"{t}.ff.net.0.proj.bias"] = sd[f"{b}.mlp.fc1.bias"]
        dsd[f"{t}.ff.net.2.weight"] = sd[f"{b}.mlp.fc2.weight"]
        dsd[f"{t}.ff.net.2.bias"] = sd[f"{b}.mlp.fc2.bias"]

    back = diffusers_to_torch_state_dict(dsd, depth=cfg.depth)
    for k in sd:
        np.testing.assert_allclose(sd[k], back[k], atol=0, err_msg=k)


def test_orbax_roundtrip(tmp_path):
    from pixart_sigma_tpu.training import TrainState, build_optimizer

    cfg = _cfg()
    _, params = _init_params(cfg)
    tx = build_optimizer(name="adamw", learning_rate=1e-3)
    state = TrainState.create(params=params, tx=tx, ema=True)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = save_train_state(str(tmp_path / "ckpts"), state)
    assert latest_checkpoint(str(tmp_path / "ckpts")) == path
    blank = TrainState.create(
        params=jax.tree_util.tree_map(jnp.zeros_like, params), tx=tx, ema=True
    )
    restored = restore_train_state(path, blank)
    assert int(restored.step) == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_orbax_params_inference_side(tmp_path):
    """Template-free param restore from a train-state dir (inference CLI).

    Covers: step_N dir, checkpoints/ parent, workdir parent, and the
    load_ema switch; also that load_checkpoint dispatches dirs to orbax.
    """
    from pixart_sigma_tpu.training import TrainState, build_optimizer
    from pixart_sigma_tpu.utils.checkpoint import (
        load_checkpoint,
        load_orbax_params,
    )

    cfg = _cfg()
    _, params = _init_params(cfg)
    tx = build_optimizer(name="adamw", learning_rate=1e-3)
    state = TrainState.create(params=params, tx=tx, ema=True)
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params))
    workdir = tmp_path / "run"
    path = save_train_state(str(workdir / "checkpoints"), state)

    for src in (path, str(workdir / "checkpoints"), str(workdir)):
        got = load_orbax_params(src)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ema = load_orbax_params(path, load_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(a) + 1.0, np.asarray(b))
    via_dispatch = load_checkpoint(str(workdir), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(via_dispatch)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repartition_scan_params_for_cache_span():
    """Orbax checkpoints keep whatever scan grouping training used; loading
    into a cache_span model must re-split the stacks (the span edges force
    new group boundaries) and preserve the function exactly."""
    from pixart_sigma_tpu.utils.checkpoint import repartition_scan_params

    cfg_plain = _cfg(depth=6, kv_compress_layers=(), scan_blocks=True)
    model_plain, params = _init_params(cfg_plain)

    cfg_span = _cfg(depth=6, kv_compress_layers=(), scan_blocks=True,
                    cache_span=(2, 5))
    model_span = PixArt(cfg_span)
    re_params = repartition_scan_params(params, cfg_span)
    assert sorted(k for k in re_params if k.startswith("blocks_scan_")) == [
        "blocks_scan_0", "blocks_scan_1", "blocks_scan_2"]
    for g, n in ((0, 2), (1, 3), (2, 1)):
        leaf = jax.tree_util.tree_leaves(re_params[f"blocks_scan_{g}"])[0]
        assert leaf.shape[0] == n

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    t = jnp.asarray([10.0, 500.0])
    mask = jnp.ones((2, 8), jnp.int32)
    out_plain = model_plain.apply({"params": params}, x, t, y, mask)
    out_span = model_span.apply({"params": re_params}, x, t, y, mask)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_span), rtol=1e-5, atol=1e-5)

    # idempotent when the layout already matches
    again = repartition_scan_params(re_params, cfg_span)
    for a, b in zip(jax.tree_util.tree_leaves(again),
                    jax.tree_util.tree_leaves(re_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
