"""Dry-run of tools/validate_released.py with a mocked tiny checkpoint.

Round-2 VERDICT item #10: the one-command released-weight validation must be
exercised end-to-end offline so it works the moment real weights are
reachable. Here a tiny random-weight model is exported to the reference .pth
dialect, then the tool runs load -> torch logit-parity -> sampling (pseudo-
T5, latents) and writes parity_report.json.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARCH = ["depth=2", "hidden_size=48", "num_heads=4", "caption_channels=64",
        "model_max_length=16"]


def _make_tiny_pth(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.utils.checkpoint import flax_to_torch_state_dict

    config = read_config(
        os.path.join(
            REPO, "configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py"
        )
    )
    model = build_model_from_config(
        config, depth=2, hidden_size=48, num_heads=4, caption_channels=64,
        model_max_length=16, dtype=jnp.float32,
    )
    cfg = model.cfg
    B, S, L = 1, cfg.input_size, cfg.model_max_length
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 4)), jnp.zeros((B,)),
        jnp.zeros((B, L, 64)), jnp.ones((B, L), jnp.int32),
    )["params"]
    # randomise the zero-init heads so parity is non-trivial
    params["final_layer"]["linear"]["kernel"] = (
        jax.random.normal(
            jax.random.PRNGKey(5),
            params["final_layer"]["linear"]["kernel"].shape,
        ) * 0.1
    )
    sd = flax_to_torch_state_dict(params, cfg)
    path = tmp_path / "tiny_sigma.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        str(path),
    )
    return str(path)


def test_validate_released_dry_run(tmp_path):
    pth = _make_tiny_pth(tmp_path)
    out_dir = tmp_path / "report"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "validate_released.py"),
        "--weights", pth,
        "--config",
        os.path.join(
            REPO, "configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py"
        ),
        "--out-dir", str(out_dir),
        "--n-images", "2", "--steps", "4", "--pseudo-t5", "64",
    ] + [a for kv in ARCH for a in ("--arch", kv)]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr

    report = json.load(open(out_dir / "parity_report.json"))
    assert report["load"]["status"] == "pass"
    assert report["parity"]["status"] == "pass", report["parity"]
    assert report["parity"]["max_abs_diff"] <= 2e-2
    assert report["sampling"] == {
        "status": "pass", "n_images": 2, "decoded": False,
        "dir": str(out_dir / "samples"),
    }
    assert report["fid"]["status"] == "skipped"
    lat = np.load(out_dir / "samples" / "latent_0.npy")
    assert np.isfinite(lat).all()
