"""Image transforms (torch-free; PIL + numpy).

Spec: /root/reference/diffusion/data/transforms.py (default_train:
RGB -> Resize(interpolation=bicubic) -> CenterCrop -> Normalize(.5,.5)) and
the multi-scale per-bucket resize+crop in InternalData_ms.py getdata.
Output layout is channel-LAST float32 in [-1, 1] (the reference is CHW).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(size) semantics: shorter side -> size, bicubic."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), Image.BICUBIC)


def center_crop(img: Image.Image, crop_h: int, crop_w: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - crop_w) / 2.0))
    top = int(round((h - crop_h) / 2.0))
    return img.crop((left, top, left + crop_w, top + crop_h))


def resize_and_crop(img: Image.Image, target_h: int, target_w: int) -> Image.Image:
    """Scale to cover (target_h, target_w) then center-crop (the multi-scale
    transform, InternalData_ms.py getdata)."""
    w, h = img.size
    scale = max(target_h / h, target_w / w)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    return center_crop(img, target_h, target_w)


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 [H, W, 3] in [-1, 1] (Normalize(mean=.5, std=.5))."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def default_train(img: Image.Image, resolution: int) -> np.ndarray:
    """The 'default_train' named transform (transforms.py:13-28)."""
    img = resize_shorter(img, resolution)
    img = center_crop(img, resolution, resolution)
    return to_normalized_array(img)


def multiscale_train(img: Image.Image, target_hw: Tuple[int, int]) -> np.ndarray:
    th, tw = int(target_hw[0]), int(target_hw[1])
    return to_normalized_array(resize_and_crop(img, th, tw))
