"""LPIPS perceptual loss (VGG16 backbone) in flax.

Spec: the reference imports `lpips.LPIPS(net='vgg')` for the DMD regression
branch (/root/reference/train_scripts/train_pixart_dmd.py:12,250-254). This
is the standard architecture: VGG16 features at the 5 ReLU taps, channel
unit-normalisation, learned 1x1 linear heads, spatial mean, sum over taps.
Weights load from the torch `lpips` package checkpoint (vgg.pth) + torchvision
VGG16 when available; random init otherwise (still a valid perceptual-ish
metric for smoke tests, and the DMD loss degrades gracefully).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (channels, convs-per-stage); taps after each stage's ReLU
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """Returns the 5 tap activations for input [B, H, W, 3] in [-1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = (x - _SHIFT) / _SCALE  # lpips ScalingLayer
        taps = []
        conv_idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_PLAN):
            for _ in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if stage < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(img0, img1) -> [B] perceptual distances. Inputs NHWC in [-1,1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        f0, f1 = vgg(x0), vgg(x1)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            diff = (a - b) ** 2
            lin = nn.Dense(
                1, use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.ones, name=f"lin_{i}",
            )
            total = total + jnp.mean(lin(diff)[..., 0], axis=(1, 2))
        return total


def torch_lpips_to_flax(vgg_sd: Dict[str, np.ndarray], lin_sd: Dict[str, np.ndarray]):
    """torchvision VGG16 `features.*` + lpips `lin*.model.1.weight` -> params."""
    params: Dict[str, Any] = {"vgg": {}}
    conv_layers = [i for i, k in enumerate(
        [f"features.{j}.weight" in vgg_sd for j in range(31)]) if k]
    for idx, layer in enumerate(conv_layers):
        w = np.asarray(vgg_sd[f"features.{layer}.weight"])  # [O, I, 3, 3]
        b = np.asarray(vgg_sd[f"features.{layer}.bias"])
        params["vgg"][f"conv_{idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": b,
        }
    for i in range(5):
        w = np.asarray(lin_sd[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        params[f"lin_{i}"] = {"kernel": w[:, :, 0, 0].T}
    return jax.tree_util.tree_map(jnp.asarray, params)
