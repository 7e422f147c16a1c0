"""scripts/train_pixart_lcm.py end-to-end on a tiny model (CPU).

Reference: train_scripts/train_pixart_lcm.py driven via its argparse entry;
ours takes a config + --teacher and runs the consistency-distillation loop.
"""

import os
import runpy
import sys

import numpy as np

from tests.test_data import _make_fake_sigma_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_TMPL = """
_base_ = ["{repo}/configs/PixArt_xl2_internal.py"]
data_root = "{data_root}"
data = dict(type="PixArtDataset", root="InternData", dialect="sigma",
            load_vae_feat=True, load_t5_feat=True)
image_size = 256
model = "PixArt_XL_2"
model_overrides = dict(depth=2, hidden_size=48, num_heads=4,
                       caption_channels=64)
fp32_attention = False
mixed_precision = "fp32"
pe_interpolation = 0.5
model_max_length = 32
train_batch_size = 4
num_workers = 0
num_epochs = 1
optimizer = dict(type="adamw", lr=1e-5, weight_decay=0.0)
lr_schedule = "constant"
lr_schedule_args = dict(num_warmup_steps=0)
auto_lr = None
log_interval = 1
save_model_steps = 2
work_dir = "{work_dir}"
"""


def test_lcm_cli_end_to_end(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.utils.checkpoint import (
        flax_to_torch_state_dict,
        latest_checkpoint,
        load_orbax_params,
    )

    _make_fake_sigma_root(tmp_path, n=8, uniform=True)
    cfg_py = tmp_path / "lcm_cfg.py"
    cfg_py.write_text(CONFIG_TMPL.format(
        repo=REPO, data_root=str(tmp_path), work_dir=str(tmp_path / "work")))

    # teacher .pth (random init; the CLI must load + distill from it)
    config = read_config(str(cfg_py))
    model = build_model_from_config(config)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 32, 64)), jnp.ones((1, 32), jnp.int32),
    )["params"]
    sd = flax_to_torch_state_dict(params, model.cfg)
    teacher_pth = tmp_path / "teacher.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        str(teacher_pth),
    )

    monkeypatch.setattr(sys, "argv", [
        "train_pixart_lcm.py", str(cfg_py),
        "--teacher", str(teacher_pth), "--max-steps", "2",
    ])
    runpy.run_path(os.path.join(REPO, "scripts/train_pixart_lcm.py"),
                   run_name="__main__")

    ck = latest_checkpoint(str(tmp_path / "work" / "checkpoints"))
    assert ck and ck.endswith("step_2")
    student = load_orbax_params(ck)
    leaves = jax.tree_util.tree_leaves(student)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the LCM student EMA must exist too (distillation target)
    ema = load_orbax_params(ck, load_ema=True)
    assert jax.tree_util.tree_structure(ema) == jax.tree_util.tree_structure(
        student)
