"""Delta block caching (opt-in turbo inference, beyond the reference).

The model's middle layers [k1, k2) form their own scan groups; their summed
residual can be cached across sampler steps and reused on non-refresh steps
(cf. Delta-DiT, PAPERS.md). These tests pin the exactness invariants:
refresh steps are bit-identical to the uncached model, and interval=1 in the
cached sampler reproduces the plain DPM trajectory exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
from pixart_sigma_tpu.pipelines import PixArtPipeline


def _model_and_inputs(cache_span):
    cfg = PixArtConfig(
        depth=4, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32, cache_span=cache_span,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([500.0, 100.0], jnp.float32)
    y = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    params = _randomize_final(params)
    return model, params, (x, t, y, mask)


def _randomize_final(params):
    """The final projection is zero-init (reference parity), which makes the
    tiny model output identically zero — give it weights so caching effects
    are observable."""
    params = jax.tree_util.tree_map(lambda v: v, params)  # copy containers
    fl = params["params"]["final_layer"]["linear"]
    fl["kernel"] = jnp.asarray(
        np.random.RandomState(9).randn(*fl["kernel"].shape).astype(np.float32)
        * 0.05
    )
    return params


def test_cache_span_groups():
    cfg = PixArtConfig(depth=28, kv_compress_sampling="conv",
                       kv_compress_scale=2,
                       kv_compress_layers=tuple(range(14, 28)),
                       cache_span=(7, 21))
    # groups must break at 7 and 21 on top of the sr change at 14
    assert cfg.block_groups() == [(1, 7), (1, 7), (2, 7), (2, 7)]


def test_compute_branch_matches_plain_forward():
    """use_block_cache=False (compute) == forward without cache args."""
    model, params, (x, t, y, mask) = _model_and_inputs(cache_span=(1, 3))
    plain = model.apply(params, x, t, y, mask)
    out, cache = model.apply(
        params, x, t, y, mask,
        block_cache=jnp.zeros((2, 16, 48)), use_block_cache=jnp.asarray(False),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
    assert cache.shape == (2, 16, 48)
    assert float(jnp.abs(cache).max()) > 0


def test_reuse_branch_reproduces_same_state():
    """Reusing a cache captured at the SAME pre-middle state is exact."""
    model, params, (x, t, y, mask) = _model_and_inputs(cache_span=(1, 3))
    out1, cache = model.apply(
        params, x, t, y, mask,
        block_cache=jnp.zeros((2, 16, 48)), use_block_cache=jnp.asarray(False),
    )
    out2, cache2 = model.apply(
        params, x, t, y, mask,
        block_cache=cache, use_block_cache=jnp.asarray(True),
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out1), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(cache2), np.asarray(cache))


def _tiny_cached_pipeline():
    cfg = PixArtConfig(
        depth=4, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32, cache_span=(1, 3),
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32),
    )
    params = _randomize_final(params)
    pipe = PixArtPipeline(model, params, base_resolution=256)
    B, L = 2, 8
    y = jnp.asarray(rng.randn(B, L, 32).astype(np.float32))
    null_y = jnp.asarray(rng.randn(B, L, 32).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    return pipe, y, null_y, mask


def test_pipeline_interval1_matches_plain():
    """refresh-every-step cached sampler == the plain DPM trajectory."""
    pipe, y, null_y, mask = _tiny_cached_pipeline()
    kw = dict(height=64, width=64, num_inference_steps=6,
              sampler="dpm-solver", y=y, y_mask=mask, y_null=null_y,
              return_latents=True)
    plain = pipe(["a", "b"], **kw)
    fn = pipe._build_dpm_cached(2, 8, 8, 6, 4.5, False, interval=1)
    mask_full = jnp.concatenate([mask, mask], axis=0)
    x = jax.random.normal(
        jax.random.split(jax.random.PRNGKey(0))[1], (2, 8, 8, 4), jnp.float32
    )
    cached = fn(pipe.params, x, y, null_y, mask_full,
                jnp.ones((2, 2)), jnp.ones((2, 1)))
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=2e-5, atol=2e-6
    )


def test_pipeline_turbo_runs_and_differs():
    """interval=2 runs end-to-end; output is finite and (slightly) different."""
    pipe, y, null_y, mask = _tiny_cached_pipeline()
    kw = dict(height=64, width=64, num_inference_steps=6,
              sampler="dpm-solver", y=y, y_mask=mask, y_null=null_y,
              return_latents=True)
    plain = pipe(["a", "b"], **kw)
    turbo = pipe(["a", "b"], block_cache_interval=2, **kw)
    assert np.isfinite(turbo).all()
    assert turbo.shape == plain.shape
    assert np.abs(turbo - plain).max() > 0  # approximation, not identity


def test_pipeline_adaptive_threshold_zero_matches_plain():
    """threshold=0: drift can never stay under it -> refresh every step ->
    bit-equal to the exact trajectory (same scan program as interval=1)."""
    pipe, y, null_y, mask = _tiny_cached_pipeline()
    kw = dict(height=64, width=64, num_inference_steps=6,
              sampler="dpm-solver", y=y, y_mask=mask, y_null=null_y,
              return_latents=True)
    plain = pipe(["a", "b"], **kw)
    adaptive = pipe(["a", "b"], block_cache_threshold=0.0, **kw)
    np.testing.assert_allclose(
        np.asarray(adaptive), np.asarray(plain), rtol=2e-5, atol=2e-6
    )


def test_pipeline_adaptive_runs_and_differs():
    """A loose threshold reuses the cache on some steps: finite output that
    deviates from (but stays close to) the exact trajectory."""
    pipe, y, null_y, mask = _tiny_cached_pipeline()
    kw = dict(height=64, width=64, num_inference_steps=8,
              sampler="dpm-solver", y=y, y_mask=mask, y_null=null_y,
              return_latents=True)
    plain = pipe(["a", "b"], **kw)
    turbo = pipe(["a", "b"], block_cache_threshold=10.0, **kw)
    assert np.isfinite(turbo).all()
    assert np.abs(turbo - plain).max() > 0


def test_adaptive_rejected_for_other_samplers():
    pipe, y, null_y, mask = _tiny_cached_pipeline()
    import pytest

    with pytest.raises(ValueError, match="block caching"):
        pipe(["a", "b"], height=64, width=64, num_inference_steps=4,
             sampler="iddpm", y=y, y_mask=mask, y_null=null_y,
             block_cache_threshold=0.1, return_latents=True)


def test_schedule_all_steps_is_exact():
    """A schedule refreshing EVERY NFE must reproduce the exact trajectory
    (same invariant as interval=1); a sparse schedule must differ."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
    from pixart_sigma_tpu.pipelines.pipeline import PixArtPipeline

    cfg = PixArtConfig(
        input_size=16, patch_size=2, hidden_size=48, depth=4, num_heads=4,
        caption_channels=32, model_max_length=8, dtype=jnp.float32,
        multi_scale=False, cache_span=(1, 3),
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    B, L = 2, 8
    x = jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(B, L, 32), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,)), y, mask)
    # zero-init heads make eps identically 0 (trajectories coincide no
    # matter what the cache does): give the final layer + block projections
    # real weights so caching effects are observable
    params = _randomize_final(params)
    tree = params["params"]
    k = jax.random.PRNGKey(7)
    for name, blk in tree.items():
        if not name.startswith("blocks"):
            continue
        for path in (("attn", "proj"), ("cross_attn", "proj"), ("mlp", "fc2")):
            leaf = blk[path[0]][path[1]]
            k, sub = jax.random.split(k)
            leaf["kernel"] = jax.random.normal(
                sub, leaf["kernel"].shape) * 0.05
    pipe = PixArtPipeline(model, params, base_resolution=128)
    steps = 6
    hw = jnp.ones((B, 2), jnp.float32)
    ar = jnp.ones((B, 1), jnp.float32)
    null_y = jnp.asarray(rng.randn(B, L, 32), jnp.float32)

    mask2 = jnp.concatenate([mask, mask], axis=0)  # CFG-doubled (pipeline)
    exact = pipe._build_dpm(B, 16, 16, steps, 4.5, False)(
        params, x, y, null_y, mask2, hw, ar)
    full = pipe._build_dpm_cached(
        B, 16, 16, steps, 4.5, False, 0, schedule=tuple(range(steps)))(
        params, x, y, null_y, mask2, hw, ar)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(exact), rtol=1e-5, atol=1e-5)
    sparse = pipe._build_dpm_cached(
        B, 16, 16, steps, 4.5, False, 0, schedule=(0, 3, 5))(
        params, x, y, null_y, mask2, hw, ar)
    assert float(jnp.abs(sparse - exact).max()) > 1e-6
