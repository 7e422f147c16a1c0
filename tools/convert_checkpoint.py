#!/usr/bin/env python
"""Checkpoint conversion CLI: .pth <-> diffusers <-> this framework.

Spec: /root/reference/tools/convert_pixart_to_diffusers.py,
convert_diffusers_to_pixart.py, merge_transformers.py. Wraps the mappings in
pixart_sigma_tpu.utils.checkpoint.

Examples:
  # reference .pth -> diffusers-naming safetensors
  python tools/convert_checkpoint.py to-diffusers model.pth out.safetensors
  # diffusers safetensors -> reference .pth
  python tools/convert_checkpoint.py to-pth transformer_dir out.pth
  # average two checkpoints (merge_transformers.py)
  python tools/convert_checkpoint.py merge a.pth b.pth out.pth --alpha 0.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _model_cfg(args):
    from pixart_sigma_tpu.models.pixart import PixArtConfig

    return PixArtConfig(
        input_size=args.image_size // 8,
        model_max_length=args.max_length,
        qk_norm=args.qk_norm,
        micro_condition=args.micro_condition,
        scan_blocks=False,
    )


def to_diffusers(args):
    import torch

    from pixart_sigma_tpu.utils.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(args.src)
    from pixart_sigma_tpu.utils.checkpoint import torch_to_diffusers_state_dict

    dsd = torch_to_diffusers_state_dict(sd)

    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in dsd.items()}, args.dst)
    print(f"wrote {len(dsd)} tensors to {args.dst}")


def to_pth(args):
    import torch

    from pixart_sigma_tpu.utils.checkpoint import (
        diffusers_to_torch_state_dict,
        load_safetensors_state_dict,
    )

    dsd = load_safetensors_state_dict(args.src)
    depth = max(
        int(k.split(".")[1]) for k in dsd if k.startswith("transformer_blocks.")
    ) + 1
    sd = diffusers_to_torch_state_dict(dsd, depth=depth)
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}},
        args.dst,
    )
    print(f"wrote {len(sd)} tensors to {args.dst}")


def merge(args):
    """Weight-average two .pth checkpoints (tools/merge_transformers.py)."""
    import torch

    from pixart_sigma_tpu.utils.checkpoint import load_torch_state_dict

    a = load_torch_state_dict(args.src)
    b = load_torch_state_dict(args.src2)
    merged = {
        k: args.alpha * a[k] + (1 - args.alpha) * b[k] for k in a if k in b
    }
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in merged.items()}},
        args.dst,
    )
    print(f"merged {len(merged)} tensors (alpha={args.alpha}) -> {args.dst}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("to-diffusers", "to-pth"):
        s = sub.add_parser(name)
        s.add_argument("src")
        s.add_argument("dst")
        s.add_argument("--image-size", type=int, default=1024)
        s.add_argument("--max-length", type=int, default=300)
        s.add_argument("--qk-norm", action="store_true")
        s.add_argument("--micro-condition", action="store_true")
    m = sub.add_parser("merge")
    m.add_argument("src")
    m.add_argument("src2")
    m.add_argument("dst")
    m.add_argument("--alpha", type=float, default=0.5)
    args = p.parse_args()
    {"to-diffusers": to_diffusers, "to-pth": to_pth, "merge": merge}[
        args.cmd.replace("_", "-")
    ](args)


if __name__ == "__main__":
    main()
