#!/usr/bin/env python
"""One-command released-checkpoint validation (round-2 VERDICT item #10).

The moment a released PixArt-Sigma checkpoint is reachable (network, or a
.pth placed under $PIXART_PRETRAINED_DIR), this runs the full parity ladder:

  1. resolve  — find_model(name-or-path) -> torch state dict -> flax params
                (reference: tools/download.py:22-47)
  2. parity   — the SAME weights into the reference torch net
                (/root/reference via the test shim) and into our flax model;
                logits must agree to fp32 tolerance (the strongest
                weight-level evidence; reference net spec PixArtMS.py:85-285)
  3. sample   — N images via the DPM-Solver-20 CFG-4.5 pipeline
                (scripts/inference.py defaults); saved as PNGs when a VAE is
                given, .npy latents otherwise
  4. FID      — optional: vs a reference image dir (e.g. an MJHQ-30K subset)
                with REAL pt_inception weights via tools/compute_fid.py

Writes <out_dir>/parity_report.json summarising every step. Steps degrade
gracefully (skipped + reason in the report) so the command is useful both in
this offline image (dry-run with a mocked tiny checkpoint, see
tests/test_validate_released.py) and with real weights.

Example (real weights + network):
  python tools/validate_released.py --weights PixArt-Sigma-XL-2-1024-MS.pth \
      --t5-dir /path/t5-v1_1-xxl --vae-path /path/sdxl_vae.safetensors \
      --inception pt_inception-2015-12-05.pth --fid-ref /path/mjhq_subset
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# released-name -> our config reproducing its architecture knobs
NAME_TO_CONFIG = {
    "PixArt-Sigma-XL-2-256x256.pth":
        "configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py",
    "PixArt-Sigma-XL-2-512-MS.pth":
        "configs/pixart_sigma_config/PixArt_sigma_xl2_img512_internalms.py",
    "PixArt-Sigma-XL-2-1024-MS.pth":
        "configs/pixart_sigma_config/PixArt_sigma_xl2_img1024_internalms.py",
    "PixArt-Sigma-XL-2-2K-MS.pth":
        "configs/pixart_sigma_config/PixArt_sigma_xl2_img2K_internalms_kvcompress.py",
}

DEFAULT_PROMPTS = [
    "A small cactus with a happy face in the Sahara desert.",
    "an astronaut sitting in a diner, eating fries, cinematic, analog film",
    "A sea otter with a pearl earring by Johannes Vermeer",
    "oil painting of a lighthouse in a storm, dramatic lighting",
    "a cyberpunk street market at night, neon signs, rain",
    "studio photo of a translucent glass chess set, macro",
    "watercolor illustration of a fox reading a book under a tree",
    "a grand piano made of ice, melting on a beach at sunset",
]


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True,
                   help="released name (needs network/cache) or local path")
    p.add_argument("--config", default=None,
                   help="config .py reproducing the checkpoint architecture; "
                        "inferred from the released name when omitted")
    p.add_argument("--arch", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="model-arch overrides (e.g. depth=2 hidden_size=48) "
                        "— used by the mocked dry-run test")
    p.add_argument("--out-dir", default="output/validate_released")
    p.add_argument("--n-images", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg-scale", type=float, default=4.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--parity-tol", type=float, default=2e-2,
                   help="max |diff| on fp32 logits (bf16-free fp32 forward)")
    p.add_argument("--parity-batch", type=int, default=1)
    p.add_argument("--t5-dir", default=None, help="T5-XXL weights dir")
    p.add_argument("--pseudo-t5", type=int, default=None, metavar="DIM",
                   help="use the deterministic PseudoT5 at this dim "
                        "(offline dry-runs)")
    p.add_argument("--vae-path", default=None,
                   help="SDXL VAE safetensors (diffusers layout)")
    p.add_argument("--vae-flax", default=None, help="native flax VAE msgpack")
    p.add_argument("--inception", default=None,
                   help="pt_inception-2015-12-05.pth for published-comparable FID")
    p.add_argument("--fid-ref", default=None,
                   help="reference image dir (e.g. MJHQ subset)")
    p.add_argument("--prompts-file", default=None)
    return p.parse_args()


def _arch_overrides(pairs):
    out = {}
    for kv in pairs:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def build_model(args):
    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.models.builder import build_model_from_config

    cfg_path = args.config
    if cfg_path is None:
        name = os.path.basename(args.weights)
        cfg_path = NAME_TO_CONFIG.get(name)
        if cfg_path is None:
            raise SystemExit(
                f"--config required: {name!r} is not a known released name "
                f"({sorted(NAME_TO_CONFIG)})"
            )
        cfg_path = os.path.join(REPO, cfg_path)
    config = read_config(cfg_path)
    import jax.numpy as jnp

    overrides = dict(_arch_overrides(args.arch))
    overrides.setdefault("dtype", jnp.float32)  # fp32 for parity/eval
    model = build_model_from_config(config, **overrides)
    return config, model


def run_parity(model, torch_sd, flax_params, args, report):
    """Same weights -> reference torch net and our flax net; compare logits."""
    try:
        from tests.torch_functional_shim import upgrade_stubs

        upgrade_stubs()
        from diffusion.model.nets.PixArt import PixArt as RefPixArt  # noqa
        from diffusion.model.nets.PixArtMS import PixArtMS as RefPixArtMS  # noqa
    except Exception as e:  # pragma: no cover - reference tree absent
        report["parity"] = {"status": "skipped", "reason": f"reference unavailable: {e}"}
        return
    import jax
    import jax.numpy as jnp
    import torch

    cfg = model.cfg
    ref_cls = RefPixArtMS if cfg.multi_scale else RefPixArt
    kv = (
        {
            "sampling": cfg.kv_compress_sampling,
            "scale_factor": cfg.kv_compress_scale,
            "kv_compress_layer": list(cfg.kv_compress_layers),
        }
        if cfg.kv_compress_sampling
        else None
    )
    ref_kwargs = dict(
        input_size=cfg.input_size, patch_size=cfg.patch_size,
        in_channels=cfg.in_channels, hidden_size=cfg.hidden_size,
        depth=cfg.depth, num_heads=cfg.num_heads,
        caption_channels=cfg.caption_channels,
        model_max_length=cfg.model_max_length,
        pe_interpolation=cfg.pe_interpolation, qk_norm=cfg.qk_norm,
        kv_compress_config=kv,
    )
    if cfg.multi_scale:
        ref_kwargs["micro_condition"] = cfg.micro_condition
    ref = ref_cls(**ref_kwargs).eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in torch_sd.items()},
        strict=False,
    )
    rng = np.random.RandomState(args.seed)
    B = args.parity_batch
    S = cfg.input_size
    L = cfg.model_max_length
    x = rng.randn(B, S, S, cfg.in_channels).astype(np.float32)
    y = rng.randn(B, L, cfg.caption_channels).astype(np.float32) * 0.1
    mask = np.ones((B, L), np.int64)
    mask[:, L // 2:] = 0
    t = np.linspace(10.0, 900.0, B).astype(np.float32)

    ours = model.apply(
        {"params": flax_params}, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(y), jnp.asarray(mask),
        **(
            dict(
                img_hw=jnp.asarray([[float(S * 8)] * 2] * B),
                aspect_ratio=jnp.asarray([[1.0]] * B),
            )
            if cfg.micro_condition
            else {}
        ),
    )
    data_info = {
        "img_hw": torch.tensor([[float(S * 8)] * 2] * B),
        "aspect_ratio": torch.tensor([[1.0]] * B),
    }
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(y)[:, None],
            mask=torch.from_numpy(mask)[:, None, None],
            data_info=data_info,
        ).numpy().transpose(0, 2, 3, 1)
    diff = float(np.abs(np.asarray(ours) - want).max())
    report["parity"] = {
        "status": "pass" if diff <= args.parity_tol else "FAIL",
        "max_abs_diff": diff,
        "tol": args.parity_tol,
        "missing_keys": [m for m in missing if m != "pos_embed"],
        "unexpected_keys": list(unexpected),
    }


def run_sampling(model, flax_params, args, report):
    import jax.numpy as jnp
    from pixart_sigma_tpu.pipelines.pipeline import PixArtPipeline

    t5 = vae = vae_params = None
    y_null_row = None
    if args.pseudo_t5:
        from pixart_sigma_tpu.models.t5 import PseudoT5Embedder

        t5 = PseudoT5Embedder(args.pseudo_t5, model.cfg.model_max_length)
        y_null_row = jnp.asarray(
            flax_params["y_embedder"]["y_embedding"], jnp.float32
        )
    elif args.t5_dir:
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(
            args.t5_dir, model_max_length=model.cfg.model_max_length
        )
    else:
        report["sampling"] = {
            "status": "skipped",
            "reason": "no text encoder (--t5-dir or --pseudo-t5)",
        }
        return
    if args.vae_flax:
        from pixart_sigma_tpu.models.vae import load_flax_vae

        vae, vae_params = load_flax_vae(args.vae_flax)
    elif args.vae_path:
        from pixart_sigma_tpu.models.vae import (
            AutoencoderKL, VAEConfig, diffusers_vae_to_flax,
        )
        from pixart_sigma_tpu.utils.checkpoint import load_safetensors_state_dict

        vcfg = VAEConfig.sdxl()
        vae = AutoencoderKL(vcfg)
        vae_params = {
            "params": diffusers_vae_to_flax(
                load_safetensors_state_dict(args.vae_path), vcfg
            )
        }

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = DEFAULT_PROMPTS
    prompts = (prompts * ((args.n_images // len(prompts)) + 1))[: args.n_images]

    res = model.cfg.input_size * 8  # latent grid -> pixels
    pipe = PixArtPipeline(
        model, {"params": flax_params}, t5=t5, vae=vae, vae_params=vae_params,
        base_resolution=res,
    )
    y_null = None
    if y_null_row is not None:  # [L, D] -> [B, L, D] (inference.py:167-168)
        y_null = jnp.broadcast_to(
            y_null_row[None], (len(prompts),) + y_null_row.shape
        )
    out = pipe(
        prompts, height=res, width=res, num_inference_steps=args.steps,
        guidance_scale=args.cfg_scale, sampler="dpm-solver", seed=args.seed,
        y_null=y_null,
    )
    img_dir = os.path.join(args.out_dir, "samples")
    os.makedirs(img_dir, exist_ok=True)
    paths = []
    if vae is not None:
        from PIL import Image

        for i, arr in enumerate(out):
            path = os.path.join(img_dir, f"sample_{i}.png")
            Image.fromarray(arr).save(path)
            paths.append(path)
    else:
        for i, arr in enumerate(np.asarray(out)):
            path = os.path.join(img_dir, f"latent_{i}.npy")
            np.save(path, arr)
            paths.append(path)
    report["sampling"] = {
        "status": "pass",
        "n_images": len(paths),
        "decoded": vae is not None,
        "dir": img_dir,
    }
    return img_dir if vae is not None else None


def run_fid(img_dir, args, report):
    if not args.fid_ref:
        report["fid"] = {"status": "skipped", "reason": "--fid-ref not given"}
        return
    if img_dir is None:
        report["fid"] = {"status": "skipped", "reason": "no decoded images"}
        return
    import subprocess

    cmd = [
        sys.executable, os.path.join(REPO, "tools", "compute_fid.py"),
        img_dir, args.fid_ref,
    ]
    if args.inception:
        cmd += ["--weights", args.inception]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        report["fid"] = {"status": "FAIL", "stderr": r.stderr[-2000:]}
        return
    line = r.stdout.strip().splitlines()[-1]
    report["fid"] = {
        "status": "pass",
        "result": json.loads(line) if line.startswith("{") else line,
        "published_comparable": bool(args.inception),
    }


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    report = {"weights": args.weights}

    from pixart_sigma_tpu.utils.checkpoint import (
        find_model, torch_to_flax_params,
    )

    config, model = build_model(args)
    torch_sd = find_model(args.weights)
    # strict: every checkpoint tensor must be consumed by this architecture
    # (schema pinned offline by tests/test_key_manifests.py)
    flax_params = torch_to_flax_params(torch_sd, model.cfg, strict=True)
    n_params = sum(int(np.prod(v.shape))
                   for v in torch_sd.values())
    report["load"] = {
        "status": "pass",
        "n_torch_tensors": len(torch_sd),
        "n_params": n_params,
    }

    if args.skip_parity:
        report["parity"] = {"status": "skipped", "reason": "--skip-parity"}
    else:
        run_parity(model, torch_sd, flax_params, args, report)

    img_dir = run_sampling(model, flax_params, args, report)
    run_fid(img_dir, args, report)

    path = os.path.join(args.out_dir, "parity_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    failed = [k for k, v in report.items()
              if isinstance(v, dict) and v.get("status") == "FAIL"]
    if failed:
        raise SystemExit(f"validation FAILED: {failed} (report: {path})")
    print(f"report -> {path}")


if __name__ == "__main__":
    main()
