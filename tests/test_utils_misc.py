"""Prompt utils, timestep sampler, mesh config, log buffer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixart_sigma_tpu.data.aspect import ASPECT_RATIO_1024_TEST
from pixart_sigma_tpu.diffusion.timestep_sampler import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from pixart_sigma_tpu.parallel.mesh import MeshConfig
from pixart_sigma_tpu.utils.logging import LogBuffer, SimpleTimer
from pixart_sigma_tpu.utils.prompt import clean_caption, prepare_prompt_ar


def test_prepare_prompt_ar():
    prompt, hw, ar, custom = prepare_prompt_ar(
        "a cat --ar 16:9", ASPECT_RATIO_1024_TEST
    )
    assert prompt == "a cat"
    # 16:9 = 1.78 snaps to the 1.75 bin [1344, 768]
    assert ar[0, 0] == pytest.approx(1.75)
    assert list(hw[0]) == [1344.0, 768.0]

    prompt, hw, ar, custom = prepare_prompt_ar(
        "a dog --hw 1100:800", ASPECT_RATIO_1024_TEST
    )
    assert prompt == "a dog"
    assert list(custom[0]) == [1100.0, 800.0]

    prompt, hw, ar, _ = prepare_prompt_ar("plain prompt", ASPECT_RATIO_1024_TEST)
    assert ar[0, 0] == 1.0 and list(hw[0]) == [1024.0, 1024.0]


def test_clean_caption():
    assert clean_caption("A <person> at https://example.com/page") == "a person at"
    assert clean_caption("Hello   WORLD &amp; more") == "hello world more"
    assert clean_caption("file photo.jpg of a cat") == "file of a cat"
    # html tags stripped
    assert "b>" not in clean_caption("<b>bold</b> cat")


def test_uniform_and_resampler():
    s = create_named_schedule_sampler("uniform", 100)
    t, w = s.sample(jax.random.PRNGKey(0), 8)
    assert t.shape == (8,) and bool((t < 100).all())
    np.testing.assert_array_equal(np.asarray(w), 1.0)

    r = create_named_schedule_sampler("loss-second-moment", 10)
    assert isinstance(r, LossSecondMomentResampler)
    # before warmup: uniform weights
    p = np.asarray(r.weights())
    np.testing.assert_allclose(p, 0.1, atol=1e-6)
    # feed losses: timestep 3 gets huge losses
    for i in range(12):
        t = jnp.asarray([3, (i % 10)])
        losses = jnp.asarray([10.0, 0.1])
        r = r.update(t, losses)
    # counts accumulate, capped at history
    assert int(r.counts[3]) == 10
    t, w = r.sample(jax.random.PRNGKey(1), 4)
    assert t.shape == (4,) and w.shape == (4,)


def test_resampler_weights_after_warmup():
    r = LossSecondMomentResampler.create(4, history_per_term=2)
    # fill all history: t=0 high loss, others low
    for _ in range(2):
        r = r.update(jnp.arange(4), jnp.asarray([5.0, 0.1, 0.1, 0.1]))
    p = np.asarray(r.weights())
    assert p[0] > p[1]  # high-loss timestep sampled more
    assert p.sum() == pytest.approx(1.0, rel=1e-5)


def test_mesh_config_resolve():
    assert MeshConfig(data=-1, fsdp=2).resolve(8) == (4, 2, 1, 1)
    assert MeshConfig(data=8).resolve(8) == (8, 1, 1, 1)
    with pytest.raises(AssertionError):
        MeshConfig(data=3, fsdp=2).resolve(8)


def test_log_buffer_and_timer():
    buf = LogBuffer()
    buf.update({"loss": 1.0})
    buf.update({"loss": 3.0})
    buf.average()
    assert buf.output["loss"] == 2.0
    timer = SimpleTimer(total=10, log_interval=2)
    assert timer.log() is None
    assert "1" in timer.log()


def test_forward_overflow_tracer_names_offending_block():
    """Forward NaN tracer (reference DebugUnderflowOverflow analogue,
    misc.py:107-386): a planted overflow must be localised to the right
    scan-group, LAYER index, and sub-module in ONE captured run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
    from pixart_sigma_tpu.utils.debug import (
        first_bad_module,
        format_overflow_report,
        scan_group_sizes_from_config,
        trace_forward,
    )

    cfg = PixArtConfig(
        depth=4, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32, multi_scale=True,
    )
    model = PixArt(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([5.0, 700.0])
    y = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y, mask)
    sizes = scan_group_sizes_from_config(cfg)
    assert sizes == {"blocks_scan_0": 4}

    # clean run: nothing reported
    _, inter = trace_forward(model, variables, x, t, y, mask)
    assert first_bad_module(inter, sizes) is None

    # plant an overflow: layer 2's mlp fc1 kernel blows up
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    k = params["blocks_scan_0"]["mlp"]["fc1"]["kernel"]
    params["blocks_scan_0"]["mlp"]["fc1"]["kernel"] = k.at[2].set(1e30)
    _, inter = trace_forward(model, {"params": params}, x, t, y, mask)
    bad = first_bad_module(inter, sizes)
    assert bad is not None
    assert bad["module"].startswith("blocks_scan_0/mlp"), bad
    assert bad["layer"] == 2, bad
    report = format_overflow_report(bad)
    assert "blocks_scan_0/mlp" in report and "layer 2" in report

    # a planted NaN in an embedder is found before any block
    params2 = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params2["t_embedder"]["fc1"]["kernel"] = (
        params2["t_embedder"]["fc1"]["kernel"] * jnp.nan
    )
    _, inter2 = trace_forward(model, {"params": params2}, x, t, y, mask)
    bad2 = first_bad_module(inter2, sizes)
    assert bad2 is not None and bad2["module"].startswith("t_embedder"), bad2
    assert bad2["nonfinite"]
