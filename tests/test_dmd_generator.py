"""tools/generate_dmd_data.py end-to-end on a tiny model (CPU).

Covers the round-1 gap: the DMD trainer's input triplets had no producer.
Reference: tools/generate_dmd_data_noise_pairs.py:26-123.
"""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CONFIG = """
model = "PixArt_XL_2"
image_size = 64
model_overrides = dict(depth=2, hidden_size=48, num_heads=4,
                       caption_channels=32)
model_max_length = 8
pe_interpolation = 0.125
mixed_precision = "fp32"
"""


def _tool():
    spec = importlib.util.spec_from_file_location(
        "generate_dmd_data", os.path.join(REPO, "tools/generate_dmd_data.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_dmd_pairs(tmp_path, monkeypatch):
    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.data.dmd_dataset import DMDDataset
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.training import TrainState, build_optimizer
    from pixart_sigma_tpu.utils.checkpoint import save_train_state

    cfg_py = tmp_path / "tiny_cfg.py"
    cfg_py.write_text(TINY_CONFIG)
    config = read_config(str(cfg_py))
    model = build_model_from_config(config)

    # teacher checkpoint (random init is fine; the tool must run it, not
    # train it)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32),
    )["params"]
    tx = build_optimizer(name="adamw", learning_rate=1e-4)
    state = TrainState.create(params=params, tx=tx, ema=False)
    save_train_state(str(tmp_path / "ckpt" / "checkpoints"), state)

    # tiny dataset: data_info.json + caption npz (one item misses the mask)
    root = tmp_path / "InternData"
    (root / "caption_features").mkdir(parents=True)
    rng = np.random.default_rng(0)
    meta = []
    for i in range(4):
        stem = f"img_{i:03d}"
        meta.append({"path": f"InternImgs/{stem}.png",
                     "prompt": f"prompt number {i}", "ratio": 1.0})
        kw = {"caption_feature": rng.standard_normal((5, 32)).astype(np.float32)}
        if i != 2:
            kw["attention_mask"] = np.ones((5,), np.int64)
        np.savez(root / "caption_features" / f"{stem}.npz", **kw)
    # an over-ratio item the tool must drop (reference keeps ratio <= 4.5)
    meta.append({"path": "InternImgs/wide.png", "prompt": "x", "ratio": 9.0})
    (root / "data_info.json").write_text(json.dumps(meta))

    tool = _tool()
    monkeypatch.setattr(sys, "argv", [
        "generate_dmd_data.py",
        "--data-root", str(root),
        "--config", str(cfg_py),
        "--model-path", str(tmp_path / "ckpt"),
        "--steps", "3", "--batch", "3", "--seed", "5",
    ])
    tool.main()

    noises = sorted(os.listdir(root / "noise"))
    latents = sorted(os.listdir(root / "base_latents"))
    assert noises == latents == [f"img_{i:03d}.npy" for i in range(4)]
    for f in noises:
        n = np.load(root / "noise" / f)
        z = np.load(root / "base_latents" / f)
        assert n.shape == z.shape == (8, 8, 4)
        assert np.isfinite(n).all() and np.isfinite(z).all()
        assert abs(float(n.std()) - 1.0) < 0.25  # unit gaussian noise

    # noise keyed by (seed, index): reproducible without rerunning the batch
    n1 = np.load(root / "noise" / "img_001.npy")
    expect = np.asarray(jax.random.normal(
        jax.random.fold_in(jax.random.PRNGKey(5), 1), (8, 8, 4), jnp.float32))
    np.testing.assert_array_equal(n1, expect)

    # the DMD dataset must read the triplets straight back
    ds = DMDDataset(str(root), max_length=8)
    ds.meta = [m for m in ds.meta if m["ratio"] <= 4.5]
    item = ds[1]
    np.testing.assert_array_equal(item["init_noise"], n1)
    assert item["base_latent"].shape == (8, 8, 4)
    assert item["y"].shape == (8, 32) and item["y_mask"].shape == (8,)

    # ---- DMD trainer CLI end-to-end on the generated pairs ----
    # (reference train_pixart_dmd.py driven by run_pixart_dmd.py; ours takes
    # the same teacher checkpoint + triplet root)
    import runpy

    # the over-ratio item has no generated pair; train on the first 4 only
    monkeypatch.setattr(sys, "argv", [
        "train_pixart_dmd.py",
        "--data-root", str(root),
        "--teacher", str(tmp_path / "ckpt" / "checkpoints"),
        "--config", str(cfg_py),
        "--sample-nums", "4",
        "--work-dir", str(tmp_path / "dmd_run"),
        "--batch-size", "2", "--max-steps", "2",
        "--log-interval", "1", "--save-steps", "2",
    ])
    runpy.run_path(os.path.join(REPO, "scripts/train_pixart_dmd.py"),
                   run_name="__main__")
    out = tmp_path / "dmd_run" / "dmd_step_2.pth"
    assert out.exists()
    import torch

    sd = torch.load(str(out), map_location="cpu", weights_only=True)["state_dict"]
    assert any(k.startswith("blocks.") for k in sd)
    assert all(torch.isfinite(v).all() for v in sd.values())
