#!/usr/bin/env python
"""Generate a synthetic text-to-image toy dataset in the Sigma data layout.

The reference directs users at a HF toy dataset for end-to-end train smoke
tests (/root/reference/README.md:120-146); this tool produces an equivalent
fully offline: colored geometric shapes with templated captions, written in
the InternData/InternImgs layout that `data/datasets.py` (dialect='sigma')
reads.

Caption features: with --t5-path, real T5 features come from
tools/extract_features.py as in production. Without T5 weights (air-gapped),
--pseudo-t5 writes deterministic per-word hash embeddings of dimension
--caption-dim — a stand-in text encoder that is a pure function of the
caption, so the DiT genuinely learns text conditioning (distinct captions ->
distinct embeddings -> distinct images).

Usage:
  python tools/make_toy_dataset.py --out /tmp/toy --n 2048 --size 128 \
      --pseudo-t5 --caption-dim 64
  # then: python tools/extract_features.py --root /tmp/toy/InternData \
  #           --vae-flax <trained_vae.msgpack> --resolution 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw

SHAPES = ("circle", "square", "triangle")
COLORS = {
    "red": (220, 40, 40),
    "green": (40, 200, 70),
    "blue": (50, 90, 230),
    "yellow": (235, 210, 50),
}
BACKGROUNDS = {"black": (12, 12, 12), "white": (240, 240, 240)}


def draw_sample(rng: np.random.Generator, size: int):
    shape = SHAPES[rng.integers(len(SHAPES))]
    color_name = list(COLORS)[rng.integers(len(COLORS))]
    bg_name = list(BACKGROUNDS)[rng.integers(len(BACKGROUNDS))]
    img = Image.new("RGB", (size, size), BACKGROUNDS[bg_name])
    d = ImageDraw.Draw(img)
    # jittered center/scale so the model must learn shape, not a fixed stamp
    r = int(size * rng.uniform(0.18, 0.32))
    cx = int(rng.uniform(r + 2, size - r - 2))
    cy = int(rng.uniform(r + 2, size - r - 2))
    col = COLORS[color_name]
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=col)
    elif shape == "square":
        d.rectangle([cx - r, cy - r, cx + r, cy + r], fill=col)
    else:
        d.polygon(
            [(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)], fill=col
        )
    prompt = f"a {color_name} {shape} on a {bg_name} background"
    return img, prompt


def pseudo_t5_features(prompt: str, dim: int, max_length: int):
    """Deterministic per-word hash embeddings (offline text-encoder stand-in).

    Each word maps to a fixed unit-variance vector seeded by a stable hash of
    the word, so equal captions always produce equal feature sequences.
    """
    import hashlib

    words = prompt.split()[:max_length]
    rows = []
    for w in words:
        seed = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
        rows.append(np.random.RandomState(seed).randn(dim))
    fea = np.stack(rows).astype(np.float16)
    mask = np.ones((len(rows),), np.int16)
    return fea, mask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="dataset root to create")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pseudo-t5", action="store_true",
                   help="write hash-embedding caption features (no T5 weights)")
    p.add_argument("--caption-dim", type=int, default=64)
    p.add_argument("--max-length", type=int, default=12)
    args = p.parse_args()

    img_dir = os.path.join(args.out, "InternImgs")
    data_dir = os.path.join(args.out, "InternData")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    cap_dir = os.path.join(data_dir, "caption_features_new")
    if args.pseudo_t5:
        os.makedirs(cap_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    meta = []
    for i in range(args.n):
        img, prompt = draw_sample(rng, args.size)
        name = f"toy_{i:06d}.png"
        img.save(os.path.join(img_dir, name))
        meta.append({
            "path": name, "prompt": prompt,
            "height": args.size, "width": args.size, "ratio": 1.0,
        })
        if args.pseudo_t5:
            fea, mask = pseudo_t5_features(
                prompt, args.caption_dim, args.max_length
            )
            np.savez(
                os.path.join(cap_dir, name.replace(".png", ".npz")),
                caption_feature=fea[None],
                attention_mask=mask[None],
            )
    with open(os.path.join(data_dir, "data_info.json"), "w") as f:
        json.dump(meta, f)
    print(f"{args.n} samples -> {args.out} "
          f"(InternImgs/ + InternData/data_info.json"
          f"{' + caption_features_new/' if args.pseudo_t5 else ''})")


if __name__ == "__main__":
    main()
