"""End-to-end Trainer smoke test: tiny model, fake data, 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pixart_sigma_tpu.config import Config
from pixart_sigma_tpu.training.trainer import Trainer
from tests.test_data import _make_fake_sigma_root


def _tiny_config(tmp_path, root):
    return Config(
        data_root=str(tmp_path),
        data=dict(
            type="PixArtDataset", root=os.path.basename(root), dialect="sigma",
            load_vae_feat=True, load_t5_feat=True,
        ),
        image_size=256,
        train_batch_size=8,
        mixed_precision="fp32",
        fp32_attention=False,
        attn_impl="xla",
        model="PixArt_XL_2",
        multi_scale=False,
        pe_interpolation=0.5,
        qk_norm=False,
        kv_compress=False,
        scan_blocks=True,
        mesh=dict(data=-1, fsdp=1, tensor=1),
        use_fsdp=False,
        num_workers=2,
        train_sampling_steps=1000,
        model_max_length=32,
        num_epochs=3,
        grad_checkpointing=False,
        gradient_clip=0.01,
        auto_lr=dict(rule="sqrt"),
        optimizer=dict(type="came", lr=2e-5, weight_decay=0.0),
        lr_schedule="constant",
        lr_schedule_args=dict(num_warmup_steps=2),
        save_model_steps=2,
        save_model_epochs=10,
        scale_factor=0.13025,
        ema_rate=0.9999,
        log_interval=1,
        load_from=None,
        resume_from=None,
        snr_loss=False,
        real_prompt_ratio=1.0,
        class_dropout_prob=0.1,
        work_dir=str(tmp_path / "work"),
        micro_condition=False,
        seed=0,
        # tiny model override consumed by build_model_from_config via MODELS?
        # -> use direct dims through the factory overrides below
    )


def test_trainer_end_to_end(tmp_path, monkeypatch):
    root = _make_fake_sigma_root(tmp_path, n=16, uniform=True)
    config = _tiny_config(tmp_path, root)

    # shrink the model via the builder
    import pixart_sigma_tpu.training.trainer as trainer_mod
    from pixart_sigma_tpu.models.builder import build_model_from_config

    def tiny_build(cfg, **over):
        return build_model_from_config(
            cfg, depth=2, hidden_size=48, num_heads=4, caption_channels=64,
            **over,
        )

    monkeypatch.setattr(trainer_mod, "build_model_from_config", tiny_build)

    trainer = Trainer(config)
    state = trainer.train(max_steps=3)
    assert int(state.step) == 3

    # metrics written and finite
    metrics_path = os.path.join(trainer.work_dir, "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_path)]
    assert lines and np.isfinite(lines[-1]["loss"])

    # checkpoint saved at step 2 and resumable
    from pixart_sigma_tpu.utils.checkpoint import latest_checkpoint

    ck = latest_checkpoint(os.path.join(trainer.work_dir, "checkpoints"))
    assert ck and ck.endswith("step_2")

    config2 = Config(dict(config))
    config2["resume_from"] = dict(checkpoint="latest")
    trainer2 = Trainer(config2)
    loader = trainer2.build_loader()
    first = next(iter(loader))
    import jax

    trainer2.init_state(jax.random.PRNGKey(0), trainer2.prepare_batch(first))
    resumed = trainer2.maybe_resume()
    assert resumed == 2


def test_trainer_on_the_fly_vae_encoding(tmp_path, monkeypatch):
    """load_vae_feat=False path: raw images -> VAE encode inside the trainer."""
    import jax
    import jax.numpy as jnp

    from pixart_sigma_tpu.models.vae import AutoencoderKL, VAEConfig

    root = _make_fake_sigma_root(tmp_path, n=16, uniform=True)
    config = _tiny_config(tmp_path, root)
    config["data"] = dict(
        type="PixArtDataset", root="InternData", dialect="sigma",
        load_vae_feat=False, load_t5_feat=True,
    )
    config["image_size"] = 64  # dataset resizes to 64px; tiny VAE /2 -> 32
    config["num_epochs"] = 1
    config["save_model_steps"] = 1000

    import pixart_sigma_tpu.training.trainer as trainer_mod
    from pixart_sigma_tpu.models.builder import build_model_from_config

    def tiny_build(cfg, **over):
        # tiny VAE downsamples /2: 64px -> 32 latent grid -> 16x16 tokens
        return build_model_from_config(
            cfg, depth=1, hidden_size=48, num_heads=4, caption_channels=64,
            input_size=32, **over,
        )

    monkeypatch.setattr(trainer_mod, "build_model_from_config", tiny_build)

    vae_cfg = VAEConfig.small_test()
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
    )
    trainer = trainer_mod.Trainer(config, vae=vae, vae_params=vae_params)
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1


def test_trainer_with_loss_second_moment_sampler(tmp_path, monkeypatch):
    root = _make_fake_sigma_root(tmp_path, n=16, uniform=True)
    config = _tiny_config(tmp_path, root)
    config["schedule_sampler"] = "loss-second-moment"
    config["num_epochs"] = 1
    config["save_model_steps"] = 1000

    import pixart_sigma_tpu.training.trainer as trainer_mod
    from pixart_sigma_tpu.models.builder import build_model_from_config

    monkeypatch.setattr(
        trainer_mod, "build_model_from_config",
        lambda cfg, **o: build_model_from_config(
            cfg, depth=1, hidden_size=48, num_heads=4, caption_channels=64, **o
        ),
    )
    trainer = trainer_mod.Trainer(config)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    # the resampler accumulated loss history
    assert int(np.asarray(trainer.sampler_state.counts).sum()) > 0


def test_trainer_multi_scale_buckets(tmp_path, monkeypatch):
    """Bucketed multi-scale training: one compiled step per (H, W) bucket,
    micro-conditioning fields threaded through."""
    root = _make_fake_sigma_root(tmp_path, n=64, uniform=False)
    config = _tiny_config(tmp_path, root)
    config["data"] = dict(
        type="PixArtMSDataset", root="InternData", dialect="sigma",
        load_vae_feat=True, load_t5_feat=True,
    )
    config["model"] = "PixArtMS_XL_2"
    config["multi_scale"] = True
    config["aspect_ratio_type"] = 256
    config["micro_condition"] = True
    config["train_batch_size"] = 8  # must divide the mesh batch axes (8 devs)
    config["num_epochs"] = 1
    config["save_model_steps"] = 1000

    import pixart_sigma_tpu.training.trainer as trainer_mod
    from pixart_sigma_tpu.models.builder import build_model_from_config

    monkeypatch.setattr(
        trainer_mod, "build_model_from_config",
        lambda cfg, **o: build_model_from_config(
            cfg, depth=1, hidden_size=48, num_heads=4, caption_channels=64, **o
        ),
    )
    trainer = trainer_mod.Trainer(config)
    state = trainer.train(max_steps=3)
    assert int(state.step) >= 2  # at least two buckets' worth of batches
