"""Model-layer parity and shape tests for the PixArt DiT.

Weight-level parity vs real checkpoints isn't possible offline (no weights in
the image), so these tests verify each layer against an equivalently-weighted
pure-torch construction, plus end-to-end shape/structure checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixart_sigma_tpu.models.layers import (
    PatchEmbed,
    timestep_embedding,
)
from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.ops.attention import attention
from tests.reference_shim import install_reference

install_reference()
from diffusion.model.nets.PixArt_blocks import TimestepEmbedder as RefTE  # noqa: E402


def test_timestep_embedding_matches_reference():
    t = np.array([0.0, 1.0, 400.0, 999.0], dtype=np.float32)
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    theirs = RefTE.timestep_embedding(torch.from_numpy(t), 256).numpy()
    # f32 sin/cos of large args differ by a few ULP between XLA and torch
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=5e-5)


def test_patch_embed_equals_torch_conv():
    rng = np.random.RandomState(0)
    B, H, W, C, D, p = 2, 8, 8, 4, 16, 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    conv_w = rng.randn(D, C, p, p).astype(np.float32)
    conv_b = rng.randn(D).astype(np.float32)

    conv = torch.nn.Conv2d(C, D, kernel_size=p, stride=p)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(conv_w))
        conv.bias.copy_(torch.from_numpy(conv_b))
    ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_tokens = ref.flatten(2).transpose(1, 2).detach().numpy()  # [B, N, D]

    # our Dense kernel layout: [(p_row, p_col, chan) flattened, D]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(p * p * C, D)
    pe = PatchEmbed(patch_size=p, embed_dim=D)
    out = pe.apply(
        {"params": {"proj": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv_b)}}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out), ref_tokens, rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_sdpa_with_mask():
    rng = np.random.RandomState(1)
    B, N, M, H, Dh = 2, 6, 5, 3, 8
    q = rng.randn(B, N, H, Dh).astype(np.float32)
    k = rng.randn(B, M, H, Dh).astype(np.float32)
    v = rng.randn(B, M, H, Dh).astype(np.float32)
    key_mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)

    ours = attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        key_mask=jnp.asarray(key_mask), impl="xla",
    )
    # torch sdpa wants [B, H, N, Dh]
    tq, tk, tv = (torch.from_numpy(a.transpose(0, 2, 1, 3)) for a in (q, k, v))
    tmask = torch.from_numpy(key_mask)[:, None, None, :]
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, attn_mask=tmask
    ).numpy().transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def _tiny_cfg(**kw):
    base = dict(
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, in_channels=4, dtype=jnp.float32,
    )
    base.update(kw)
    return PixArtConfig(**base)


def _inputs(B=2, H=8, W=8, L=8, cch=32):
    rng = np.random.RandomState(2)
    return (
        jnp.asarray(rng.randn(B, H, W, 4).astype(np.float32)),
        jnp.asarray([5.0, 700.0]),
        jnp.asarray(rng.randn(B, L, cch).astype(np.float32)),
        jnp.ones((B, L), dtype=jnp.int32),
    )


def test_forward_shapes_and_rectangular():
    cfg = _tiny_cfg(multi_scale=True)
    model = PixArt(cfg)
    x, t, y, mask = _inputs(H=8, W=12)
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    out = model.apply(params, x, t, y, mask)
    assert out.shape == (2, 8, 12, 8)  # pred_sigma doubles channels


def test_kv_compress_variants():
    for sampling in ["conv", "ave", "uniform", "uniform_every"]:
        cfg = _tiny_cfg(
            kv_compress_sampling=sampling, kv_compress_scale=2,
            kv_compress_layers=(1,),
        )
        model = PixArt(cfg)
        x, t, y, mask = _inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
        out = model.apply(params, x, t, y, mask)
        assert out.shape == (2, 8, 8, 8), sampling
        assert bool(jnp.isfinite(out).all()), sampling


def test_caption_force_drop_matches_null_embedding():
    cfg = _tiny_cfg()
    model = PixArt(cfg)
    x, t, y, mask = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    # dropping the caption == feeding the learned null embedding directly
    null = params["params"]["y_embedder"]["y_embedding"]
    out_dropped = model.apply(
        params, x, t, y, mask, force_drop_ids=jnp.array([1, 1])
    )
    out_null = model.apply(
        params, x, t, jnp.broadcast_to(null[None], y.shape), mask
    )
    np.testing.assert_allclose(
        np.asarray(out_dropped), np.asarray(out_null), rtol=1e-5, atol=1e-6
    )


def test_padded_mask_equals_short_caption():
    """Padded keys must not influence cross-attention (masking parity with
    the reference's ragged packing, PixArt.py:164-169)."""
    cfg = _tiny_cfg()
    model = PixArt(cfg)
    x, t, y, mask = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    valid = 3
    mask_short = jnp.asarray(
        np.concatenate([np.ones((2, valid)), np.zeros((2, 8 - valid))], axis=1).astype(np.int32)
    )
    out1 = model.apply(params, x, t, y, mask_short)
    # mutate the padded region wildly: output must not change
    y_mutated = y.at[:, valid:].set(1e4)
    out2 = model.apply(params, x, t, y_mutated, mask_short)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_forward_with_dpmsolver_and_cfg():
    cfg = _tiny_cfg()
    model = PixArt(cfg)
    x, t, y, mask = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    eps = model.apply(
        params, x, t, y, mask, method=PixArt.forward_with_dpmsolver
    )
    assert eps.shape == (2, 8, 8, 4)
    out_cfg = model.apply(
        params, x, t, y, 4.5, mask, method=PixArt.forward_with_cfg
    )
    assert out_cfg.shape == (2, 8, 8, 8)


def test_zero_init_heads():
    """cross_attn.proj and final linear are zero-init (PixArt.py:243-255)."""
    cfg = _tiny_cfg(scan_blocks=False)
    model = PixArt(cfg)
    x, t, y, mask = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)["params"]
    assert float(jnp.abs(params["blocks_0"]["cross_attn"]["proj"]["kernel"]).max()) == 0
    assert float(jnp.abs(params["final_layer"]["linear"]["kernel"]).max()) == 0


def test_scan_blocks_matches_unrolled():
    """nn.scan over blocks must equal the per-layer loop numerically."""
    from pixart_sigma_tpu.utils.param_layout import stack_block_params

    kw = dict(
        depth=4, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32,
        kv_compress_sampling="conv", kv_compress_scale=2,
        kv_compress_layers=(2, 3),
    )
    cfg_loop = PixArtConfig(scan_blocks=False, **kw)
    cfg_scan = PixArtConfig(scan_blocks=True, **kw)
    x, t, y, mask = _inputs()
    loop_model, scan_model = PixArt(cfg_loop), PixArt(cfg_scan)
    params = loop_model.init(jax.random.PRNGKey(0), x, t, y, mask)["params"]
    out_loop = loop_model.apply({"params": params}, x, t, y, mask)
    stacked = stack_block_params(params, cfg_scan)
    out_scan = scan_model.apply({"params": stacked}, x, t, y, mask)
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )


def test_masked_token_training_forward():
    """mask_ratio forward path (reference model/utils.py:255-307 analog):
    train=True returns (out, token_mask) with the configured drop fraction,
    eval ignores masking, the learned mask_token exists in the param tree,
    and gradients flow through the masked path."""
    cfg = _tiny_cfg(multi_scale=True, mask_ratio=0.25, mask_type="random")
    model = PixArt(cfg)
    x, t, y, mask = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    assert params["params"]["mask_token"].shape == (1, 1, 48)

    out, token_mask = model.apply(
        params, x, t, y, mask, train=True,
        rngs={"caption_drop": jax.random.PRNGKey(1),
              "mask": jax.random.PRNGKey(2)},
    )
    L = (8 // 2) * (8 // 2)
    assert out.shape == (2, 8, 8, 8) and token_mask.shape == (2, L)
    # len_keep = int(L * (1 - 0.25)) -> L - len_keep removed per sample
    removed = L - int(L * 0.75)
    assert np.all(np.asarray(token_mask.sum(axis=1)) == removed)
    assert np.isfinite(np.asarray(out)).all()

    # different mask rng -> different token subset -> different output
    out2, tm2 = model.apply(
        params, x, t, y, mask, train=True,
        rngs={"caption_drop": jax.random.PRNGKey(1),
              "mask": jax.random.PRNGKey(3)},
    )
    assert not np.array_equal(np.asarray(token_mask), np.asarray(tm2))

    # eval path: plain tensor, no masking applied
    out_eval = model.apply(params, x, t, y, mask)
    assert isinstance(out_eval, jnp.ndarray)

    # gradients flow through the masked forward (incl. mask_token) — the
    # zero-initialised output head blocks them at init, so perturb it first
    p0 = jax.tree_util.tree_map(lambda a: a, params["params"])
    p0["final_layer"]["linear"]["kernel"] = (
        p0["final_layer"]["linear"]["kernel"] + 0.01
    )

    def loss(p):
        o, _ = model.apply(
            {"params": p}, x, t, y, mask, train=True,
            rngs={"caption_drop": jax.random.PRNGKey(1),
                  "mask": jax.random.PRNGKey(2)},
        )
        return jnp.mean(o**2)

    g = jax.grad(loss)(p0)
    assert float(jnp.abs(g["mask_token"]).sum()) > 0
