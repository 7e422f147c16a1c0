#!/usr/bin/env python
"""FID: Fréchet distance + InceptionV3 activation extraction.

The north-star asks for FID/CLIP parity vs released checkpoints. Two entry
points:

  # activations from a directory of images (or an .npz with 'activations')
  python tools/compute_fid.py real_dir_or.npz fake_dir_or.npz \
      [--weights pt_inception-2015-12-05.pth] [--batch 32] [--save-acts dir]

With --weights, features come from the standard pytorch-fid InceptionV3 and
the number is comparable to published FIDs. Without (offline image), a
fixed-seed random InceptionV3 embedding is used — a valid RELATIVE
dissimilarity statistic for tracking training, clearly labelled as such.

FID = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), computed in pure numpy
(PSD eigendecomposition square root).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _sqrtm_psd(mat: np.ndarray, iters: int = 50) -> np.ndarray:
    """Matrix square root of a PSD matrix via eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(acts1: np.ndarray, acts2: np.ndarray) -> float:
    mu1, mu2 = acts1.mean(0), acts2.mean(0)
    s1 = np.cov(acts1, rowvar=False)
    s2 = np.cov(acts2, rowvar=False)
    diff = mu1 - mu2
    # Tr sqrt(S1 S2) via sqrt(S1) S2 sqrt(S1) (PSD-symmetric form)
    rs1 = _sqrtm_psd(s1)
    covmean = _sqrtm_psd(rs1 @ s2 @ rs1)
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def _load_image_dir(path: str) -> np.ndarray:
    from PIL import Image

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(IMG_EXTS)
    )
    if not files:
        raise ValueError(f"no images found in {path}")
    imgs = []
    for f in files:
        with Image.open(f) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
    return np.stack(imgs)


def _activations(source: str, args, model_cache: dict) -> np.ndarray:
    if source.endswith(".npz"):
        return np.load(source)["activations"].astype(np.float64)
    from pixart_sigma_tpu.models.inception import (
        extract_activations,
        load_fid_inception,
        random_inception_params,
    )

    if "model" not in model_cache:
        if args.weights:
            model_cache["model"] = load_fid_inception(args.weights)
            model_cache["tag"] = "pt_inception"
        else:
            model_cache["model"] = random_inception_params(seed=args.seed)
            model_cache["tag"] = f"random(seed={args.seed})"
    model, variables = model_cache["model"]
    images = _load_image_dir(source)
    acts = extract_activations(model, variables, images, batch=args.batch)
    if args.save_acts:
        os.makedirs(args.save_acts, exist_ok=True)
        out = os.path.join(
            args.save_acts, os.path.basename(source.rstrip("/")) + "_acts.npz")
        np.savez(out, activations=acts)
        print(f"activations -> {out}")
    return acts.astype(np.float64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("real", help="image dir or .npz with 'activations' [N, D]")
    p.add_argument("fake", help="image dir or .npz with 'activations' [N, D]")
    p.add_argument("--weights", default=None,
                   help="pt_inception .pth (comparable to published FIDs)")
    p.add_argument("--seed", type=int, default=0,
                   help="seed of the random extractor when no weights")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--save-acts", default=None, help="dir to save .npz acts")
    p.add_argument("--cpu", action="store_true",
                   help="extract on host CPU (leave the TPU to training)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cache: dict = {}
    a1 = _activations(args.real, args, cache)
    a2 = _activations(args.fake, args, cache)
    tag = cache.get("tag", "precomputed")
    print(f"FID[{tag}] = {frechet_distance(a1, a2):.4f}")


if __name__ == "__main__":
    main()
