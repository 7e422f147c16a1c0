"""End-to-end smoke for scripts/train_dreambooth_lora.py (CPU, tiny model).

Covers: latents-from-.npy path, prompt-embeds npz path, prior preservation,
and the merged .pth export (reference train_dreambooth_lora.py surface).
"""

import os
import runpy
import sys

import numpy as np
import pytest


CONFIG_TMPL = """
image_size = 64
model = "PixArt_XL_2"
mixed_precision = "fp32"
fp32_attention = False
attn_impl = "xla"
pe_interpolation = 0.125
model_max_length = 8
train_sampling_steps = 100
train_batch_size = 2
scale_factor = 0.13025
seed = 0
log_interval = 2
model_overrides = dict(depth=2, hidden_size=48, num_heads=4,
                       caption_channels=32)
"""


def test_dreambooth_lora_cli(tmp_path, monkeypatch):
    cfg_path = tmp_path / "db_config.py"
    cfg_path.write_text(CONFIG_TMPL)

    # tiny base checkpoint in the reference .pth dialect
    import jax
    import jax.numpy as jnp
    import torch

    from pixart_sigma_tpu.models.pixart import PixArt_XL_2
    from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

    model = PixArt_XL_2(
        input_size=8, pe_interpolation=0.125, model_max_length=8,
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        dtype=jnp.float32,
    )
    p = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32),
    )["params"]
    sd = flax_to_torch_state_dict(p, model.cfg)
    base = tmp_path / "base.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        base,
    )

    rng = np.random.RandomState(0)
    inst_dir = tmp_path / "instance"
    cls_dir = tmp_path / "cls"
    for d, n in ((inst_dir, 3), (cls_dir, 4)):
        d.mkdir()
        for i in range(n):
            np.save(d / f"{i}.npy", rng.randn(8, 8, 4).astype(np.float32))

    embeds = tmp_path / "embeds.npz"
    np.savez(
        embeds,
        y_instance=rng.randn(8, 32).astype(np.float32),
        mask_instance=np.ones(8, np.int32),
        y_class=rng.randn(8, 32).astype(np.float32),
        mask_class=np.ones(8, np.int32),
    )

    work = tmp_path / "work"
    argv = [
        "train_dreambooth_lora.py", str(cfg_path),
        "--base", str(base),
        "--instance-dir", str(inst_dir),
        "--class-dir", str(cls_dir),
        "--prompt-embeds", str(embeds),
        "--work-dir", str(work),
        "--max-steps", "3",
        "--batch-size", "2",
        "--rank", "2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "train_dreambooth_lora.py",
    )
    runpy.run_path(script, run_name="__main__")

    out = work / "dreambooth_lora_merged.pth"
    assert out.is_file()
    merged = torch.load(out, weights_only=False)["state_dict"]
    # LoRA must have moved the attention projections away from the base
    moved = sum(
        float((merged[k] - torch.from_numpy(np.asarray(sd[k]))).abs().max()) > 0
        for k in sd
        if "attn" in k and k.endswith("weight")
    )
    assert moved > 0


def test_dreambooth_cli_no_prior(tmp_path, monkeypatch):
    cfg_path = tmp_path / "db_config.py"
    cfg_path.write_text(CONFIG_TMPL)

    import jax
    import jax.numpy as jnp
    import torch

    from pixart_sigma_tpu.models.pixart import PixArt_XL_2
    from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

    model = PixArt_XL_2(
        input_size=8, pe_interpolation=0.125, model_max_length=8,
        depth=2, hidden_size=48, num_heads=4, caption_channels=32,
        dtype=jnp.float32,
    )
    p = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32),
    )["params"]
    base = tmp_path / "base.pth"
    sd = flax_to_torch_state_dict(p, model.cfg)
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        base,
    )

    rng = np.random.RandomState(0)
    inst_dir = tmp_path / "instance"
    inst_dir.mkdir()
    for i in range(2):
        np.save(inst_dir / f"{i}.npy", rng.randn(8, 8, 4).astype(np.float32))
    embeds = tmp_path / "embeds.npz"
    np.savez(
        embeds,
        y_instance=rng.randn(8, 32).astype(np.float32),
        mask_instance=np.ones(8, np.int32),
    )

    monkeypatch.setattr(sys, "argv", [
        "train_dreambooth_lora.py", str(cfg_path),
        "--base", str(base),
        "--instance-dir", str(inst_dir),
        "--prompt-embeds", str(embeds),
        "--work-dir", str(tmp_path / "work2"),
        "--max-steps", "2",
        "--batch-size", "2",
        "--rank", "2",
    ])
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "train_dreambooth_lora.py",
    )
    runpy.run_path(script, run_name="__main__")
    assert (tmp_path / "work2" / "dreambooth_lora_merged.pth").is_file()
