#!/usr/bin/env python
"""Fréchet distance between two activation sets (the FID statistic).

The north-star asks for FID/CLIP parity vs released checkpoints. This image
is offline (no InceptionV3/CLIP weights reachable), so the harness is split:
activations are extracted wherever weights exist (any framework), saved as
.npz {'activations': [N, D]}, and this tool computes the Fréchet distance
FID = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) in pure numpy/scipy-free
form (Newton-Schulz sqrtm).

Usage: python tools/compute_fid.py real_acts.npz fake_acts.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("real", help=".npz with 'activations' [N, D]")
    p.add_argument("fake", help=".npz with 'activations' [N, D]")
    args = p.parse_args()
    a1 = np.load(args.real)["activations"].astype(np.float64)
    a2 = np.load(args.fake)["activations"].astype(np.float64)
    print(f"FID = {frechet_distance(a1, a2):.4f}")


if __name__ == "__main__":
    main()
