"""Gradio-path coverage for scripts/interface.py.

The image has no gradio, so the UI wiring (reference
app/app_pixart_sigma.py / scripts/interface.py gradio branch) is exercised
against a minimal stub module: Interface construction, widget set, and the
generate callback end-to-end through a tiny real pipeline + VAE decode to a
PIL image.
"""

import os
import runpy
import sys
import types

import numpy as np
import pytest


class _Widget:
    def __init__(self, *a, **kw):
        self.args = a
        self.kwargs = kw


class _FakeInterface:
    created = []

    def __init__(self, *, fn, inputs, outputs, title=None, **kw):
        self.fn = fn
        self.inputs = inputs
        self.outputs = outputs
        self.title = title
        self.launched = None
        _FakeInterface.created.append(self)

    def launch(self, **kw):
        self.launched = kw


def _install_fake_gradio(monkeypatch):
    gr = types.ModuleType("gradio")
    gr.__spec__ = types.SimpleNamespace(name="gradio")  # importlib probing
    gr.Interface = _FakeInterface
    gr.Textbox = _Widget
    gr.Dropdown = _Widget
    gr.Slider = _Widget
    gr.Number = _Widget
    gr.Image = _Widget
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


def _tiny_pipe_with_vae():
    import jax
    import jax.numpy as jnp

    from pixart_sigma_tpu.models.pixart import PixArt, PixArtConfig
    from pixart_sigma_tpu.models.vae import AutoencoderKL, VAEConfig
    from pixart_sigma_tpu.pipelines import PixArtPipeline

    cfg = PixArtConfig(
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        model_max_length=8, dtype=jnp.float32,
    )
    model = PixArt(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    y = jnp.zeros((1, 8, 32))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), y, mask)

    vae = AutoencoderKL(VAEConfig.small_test())
    vae_params = vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(2)
    )
    return PixArtPipeline(
        model, params, vae=vae, vae_params=vae_params, base_resolution=256
    )


def test_gradio_interface_wiring(monkeypatch):
    _install_fake_gradio(monkeypatch)
    _FakeInterface.created.clear()
    mod = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "scripts", "interface.py"),
        run_name="interface_under_test",
    )

    pipe = _tiny_pipe_with_vae()
    args = types.SimpleNamespace(port=7860)
    mod["run_gradio"](pipe, args)

    assert len(_FakeInterface.created) == 1
    demo = _FakeInterface.created[0]
    assert demo.launched == {"server_name": "0.0.0.0", "server_port": 7860}
    # widget set mirrors the reference app's controls
    assert len(demo.inputs) == 6
    sampler_choices = demo.inputs[2].args[0]
    assert set(sampler_choices) >= {"dpm-solver", "sa-solver", "iddpm", "lcm"}

    # drive the generate callback end-to-end (style -> pipe -> PIL image)
    with pytest.warns(UserWarning, match="no T5 encoder"):
        img = demo.fn("a tiny red square", "Cinematic", "dpm-solver", 3, 4.5, 0)
    from PIL import Image

    assert isinstance(img, Image.Image)
    assert img.size == (64, 64)  # 8x8 latent grid at the tiny config


def test_apply_style_presets():
    mod = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "scripts", "interface.py"),
        run_name="interface_under_test",
    )
    apply_style, styles = mod["apply_style"], mod["STYLES"]
    prompt, negative = apply_style("Cinematic", "a cat")
    assert "a cat" in prompt and prompt != "a cat"
    assert negative  # cinematic preset carries a negative prompt
    p_none, n_none = apply_style("None", "a cat")
    assert p_none == "a cat"
    assert "None" in styles
