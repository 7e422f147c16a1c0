"""EDM sampler parity vs reference + masking utils parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pixart_sigma_tpu.diffusion.edm import edm_sampler, karras_sigmas
from pixart_sigma_tpu.ops.masking import (
    fft_strength,
    get_mask,
    mask_out_token,
    unmask_tokens,
)

FAKE_W = np.random.RandomState(11).randn(4, 4).astype(np.float64) * 0.1


def test_karras_sigmas_match_reference_formula():
    t = karras_sigmas(18, 0.002, 80.0, 7.0)
    idx = torch.arange(18, dtype=torch.float64)
    want = (80 ** (1 / 7) + idx / 17 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    np.testing.assert_allclose(t[:-1], want.numpy(), rtol=1e-12)
    assert t[-1] == 0.0


def test_edm_sampler_matches_torch_loop():
    B, D = 2, 4
    x0 = np.random.RandomState(12).randn(B, D).astype(np.float64)

    def denoise_np(x, sigma):
        return np.tanh(x @ FAKE_W) * (1 + 0.01 * sigma)

    # torch-style reference loop (deterministic: s_churn=0)
    t_steps = karras_sigmas(10)
    x = x0 * t_steps[0]
    for i in range(10):
        t_cur, t_next = t_steps[i], t_steps[i + 1]
        den = denoise_np(x, t_cur)
        d = (x - den) / t_cur
        x_e = x + (t_next - t_cur) * d
        if i < 9:
            den2 = denoise_np(x_e, t_next)
            d2 = (x_e - den2) / t_next
            x = x + (t_next - t_cur) * 0.5 * (d + d2)
        else:
            x = x_e
    want = x

    got = edm_sampler(
        lambda x, s: jnp.tanh(x @ FAKE_W.astype(np.float32)) * (1 + 0.01 * s),
        jnp.asarray(x0, jnp.float32), jax.random.PRNGKey(0), num_steps=10,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_random_mask_roundtrip():
    rng = jax.random.PRNGKey(0)
    B, L, D = 2, 16, 8
    x = jnp.asarray(np.random.RandomState(0).randn(B, L, D), jnp.float32)
    md = get_mask(rng, B, L, mask_ratio=0.5)
    kept = mask_out_token(x, md["ids_keep"])
    assert kept.shape == (B, 8, D)
    token = jnp.zeros((D,))
    restored = unmask_tokens(kept, md["ids_restore"], token)
    assert restored.shape == (B, L, D)
    # kept positions recover the original values
    keep_mask = (md["mask"] == 0)[..., None]
    np.testing.assert_allclose(
        np.asarray(jnp.where(keep_mask, restored - x, 0.0)), 0.0, atol=1e-6
    )
    assert int(md["mask"].sum()) == B * 8


def test_fft_strength_shape():
    img = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    s = fft_strength(img, patch=4)
    assert s.shape == (2, 16)
    md = get_mask(jax.random.PRNGKey(0), 2, 16, 0.5, mask_type="fft", strength=s)
    assert md["ids_keep"].shape == (2, 8)


def test_window_partition_roundtrip():
    from pixart_sigma_tpu.ops.windows import window_partition, window_unpartition

    x = jnp.asarray(np.random.RandomState(3).randn(2, 10, 14, 8), jnp.float32)
    windows, (Hp, Wp) = window_partition(x, window_size=4)
    assert Hp == 12 and Wp == 16
    assert windows.shape == (2 * 3 * 4, 4, 4, 8)
    back = window_unpartition(windows, 4, (Hp, Wp), (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_decomposed_rel_pos_shapes():
    from pixart_sigma_tpu.ops.windows import add_decomposed_rel_pos, get_rel_pos

    rng = np.random.RandomState(4)
    rel = jnp.asarray(rng.randn(7, 8), jnp.float32)  # (2*4-1, C)
    r = get_rel_pos(4, 4, rel)
    assert r.shape == (4, 4, 8)
    attn = jnp.zeros((2, 16, 16))
    q = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    out = add_decomposed_rel_pos(attn, q, rel, rel, (4, 4), (4, 4))
    assert out.shape == (2, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
