"""Dynamic int8 (W8A8) quantized serving path (ops/quant.py + QuantDense).

Not a reference feature (the reference serves fp16) — this is the TPU
serving accelerator: int8 MXU matmuls run at 2x the bf16 rate on v5e.
Quality is validated end-to-end on the toy stack (docs/toy_workflow.md);
these tests pin the numerics contract and checkpoint compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.ops.quant import int8_matmul, quantize_cols, quantize_rows


def test_quantize_roundtrip_error_bounds():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    q, s = quantize_rows(x)
    deq = q.astype(jnp.float32) * s
    # symmetric int8: error <= half a quantization step per element
    assert float(jnp.abs(deq - x).max()) <= float(s.max()) * 0.5 + 1e-6
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32))
    qw, sw = quantize_cols(w)
    deqw = qw.astype(jnp.float32) * sw[None]
    assert float(jnp.abs(deqw - w).max()) <= float(sw.max()) * 0.5 + 1e-6


def test_int8_matmul_close_to_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 256, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 512).astype(np.float32))
    b = jnp.asarray(rng.randn(512).astype(np.float32))
    exact = x @ w + b
    quant = int8_matmul(x, w, b)
    # W8A8 with per-token/per-channel scales: ~1% relative error on
    # gaussian data
    rel = float(
        jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact)
    )
    assert rel < 0.02, rel
    # int8 of an exactly-representable input is exact
    xq = jnp.round(x * 10) / 10.0  # still quantized dynamically; check finite
    assert bool(jnp.isfinite(int8_matmul(xq, w, b)).all())


def _tiny(quant):
    return PixArtConfig(
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32, quant_int8=quant,
    )


def _inputs():
    rng = np.random.RandomState(2)
    return (
        jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)),
        jnp.asarray([5.0, 700.0]),
        jnp.asarray(rng.randn(2, 8, 32).astype(np.float32)),
        jnp.ones((2, 8), dtype=jnp.int32),
    )


def test_quant_model_params_identical_to_fp():
    """quant_int8 must not change the checkpoint layout: same tree, same
    shapes/dtypes — every loader works unchanged."""
    x, t, y, mask = _inputs()
    p_fp = PixArt(_tiny(False)).init(jax.random.PRNGKey(0), x, t, y, mask)
    p_q = PixArt(_tiny(True)).init(jax.random.PRNGKey(0), x, t, y, mask)
    sd_fp = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_fp)
    sd_q = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_q)
    assert jax.tree_util.tree_structure(sd_fp) == jax.tree_util.tree_structure(sd_q)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, sd_fp, sd_q)
    )


def test_quant_forward_tracks_fp_forward():
    """The int8 forward approximates the f32 forward (same weights)."""
    x, t, y, mask = _inputs()
    model_fp = PixArt(_tiny(False))
    model_q = PixArt(_tiny(True))
    params = model_fp.init(jax.random.PRNGKey(0), x, t, y, mask)
    out_fp = np.asarray(model_fp.apply(params, x, t, y, mask))
    out_q = np.asarray(model_q.apply(params, x, t, y, mask))
    assert np.isfinite(out_q).all()
    rel = np.linalg.norm(out_q - out_fp) / (np.linalg.norm(out_fp) + 1e-9)
    assert rel < 0.05, rel
