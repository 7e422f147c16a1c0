"""InceptionV3 feature extractor for FID, in flax.

Spec: the reference's FID evaluation protocol (README "FID on MJHQ-30k";
asset/docs in /root/reference) uses the standard pytorch-fid InceptionV3 —
the TF-Inception port with three deviations from torchvision kept for
numerical parity with every published FID number:

- InceptionA/C pool branches use 3x3 stride-1 average pooling that EXCLUDES
  the zero padding from the divisor (count_include_pad=False),
- Mixed_7b (E_1) likewise, while Mixed_7c (E_2) uses a 3x3 stride-1 MAX
  pool (a quirk of the original TF port, preserved on purpose),
- inputs are bilinearly resized to 299x299 (align_corners=False semantics)
  and mapped from [0, 1] to [-1, 1].

The module tree is named after the torch attribute paths (Mixed_5b /
branch1x1 / conv ...) so `torch_inception_to_flax` is a mechanical key map:
point it at the standard `pt_inception-2015-12-05-6726825d.pth` state dict
once weights are reachable. Until then `random_inception_params` gives a
fixed-seed random extractor: FID against a frozen random embedding is still
a valid relative dissimilarity statistic for tracking training progress
(it is NOT comparable to published FID numbers — callers must say which
weights produced a number).

Everything is eval-mode: BatchNorm folds to a per-channel affine using the
stored running statistics, so the whole network is conv+affine+relu+pool —
XLA fuses it into a handful of MXU convolutions per block.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

FEATURE_DIM = 2048
INPUT_SIZE = 299


def _avg_pool_3x3_exclude_pad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME avg pool, padding excluded from the divisor."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, "SAME")
    return summed / counts


def _max_pool(x: jnp.ndarray, window: int, stride: int,
              padding: str = "VALID") -> jnp.ndarray:
    return nn.max_pool(x, (window, window), (stride, stride), padding)


class BasicConv2d(nn.Module):
    """Conv (no bias) + eval-mode BatchNorm (eps 1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, tuple):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(
            self.features, self.kernel, (self.stride, self.stride),
            padding=pad, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d,
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d,
                         name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str  # 'avg' (Mixed_7b / FIDInceptionE_1) or 'max' (Mixed_7c)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_3x3_exclude_pad(x)
        else:  # Mixed_7c: the TF port's max pool, kept for FID parity
            bp = _max_pool(x, 3, 1, padding="SAME")
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID feature extractor: [B, H, W, 3] in [0, 1] -> [B, 2048].

    Mirrors pytorch-fid's InceptionV3([block_idx=3], resize_input=True,
    normalize_input=True) final-pool output.
    """

    dtype: Any = jnp.float32
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        if self.resize_input and x.shape[1:3] != (INPUT_SIZE, INPUT_SIZE):
            x = jax.image.resize(
                x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, x.shape[3]),
                method="bilinear",
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
        # global average pool == adaptive_avg_pool2d(1)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# ------------------------------------------------------------------ weights
def torch_inception_to_flax(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """pt_inception / torchvision inception_v3 state dict -> flax variables.

    Returns {'params': ..., 'batch_stats': ...}. Keys like
    `Mixed_5b.branch1x1.conv.weight` map positionally onto the identically
    named flax module tree; the fc / AuxLogits heads are ignored (FID uses
    the pooled features only).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree: Dict[str, Any], path: Sequence[str], leaf_key: str, v):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf_key] = jnp.asarray(v)

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits") or key.endswith(
                "num_batches_tracked"):
            continue
        v = np.asarray(val)
        *mods, kind, leaf = parts
        if kind == "conv" and leaf == "weight":
            put(params, mods + ["conv"], "kernel", v.transpose(2, 3, 1, 0))
        elif kind == "bn" and leaf == "weight":
            put(params, mods + ["bn"], "scale", v)
        elif kind == "bn" and leaf == "bias":
            put(params, mods + ["bn"], "bias", v)
        elif kind == "bn" and leaf == "running_mean":
            put(stats, mods + ["bn"], "mean", v)
        elif kind == "bn" and leaf == "running_var":
            put(stats, mods + ["bn"], "var", v)
        else:
            raise ValueError(f"unrecognised inception key: {key}")
    return {"params": params, "batch_stats": stats}


def load_fid_inception(path: str, dtype: Any = jnp.float32):
    """Load a pt_inception .pth -> (module, variables)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return InceptionV3(dtype=dtype), torch_inception_to_flax(sd)


def random_inception_params(seed: int = 0, dtype: Any = jnp.float32):
    """Fixed-seed random extractor for offline/relative FID tracking.

    Conv kernels are He-normal (std = sqrt(2/fan_in)): flax's default lecun
    init halves variance at every ReLU, and over the ~47-conv deepest path
    the inter-image signal collapses to numerical noise (measured: across-
    image feature std 4e-5 with lecun vs 0.10 with He; FID(toy, noise) went
    0.0 -> 86.8). He keeps the random cascade variance-preserving, so the
    2048-d embedding stays a discriminative random projection.
    """
    model = InceptionV3(dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3), jnp.float32),
    )

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables["params"])
    key = jax.random.PRNGKey(seed + 1)
    leaves = []
    for path, leaf in flat:
        names = [p.key for p in path]
        if names[-2:] == ["conv", "kernel"]:
            key, sub = jax.random.split(key)
            kh, kw, cin, _ = leaf.shape
            leaf = jax.random.normal(sub, leaf.shape, leaf.dtype) * np.sqrt(
                2.0 / (kh * kw * cin))
        leaves.append(leaf)
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, variables


def extract_activations(
    model: InceptionV3,
    variables: Dict[str, Any],
    images: np.ndarray,
    batch: int = 32,
) -> np.ndarray:
    """images [N, H, W, 3] in [0, 1] -> activations [N, 2048] (f32).

    Batches through one jitted apply; the tail batch is padded to the jitted
    shape so the tunneled TPU sees a single compiled program.
    """
    apply = jax.jit(lambda x: model.apply(variables, x))
    n = images.shape[0]
    out = np.empty((n, FEATURE_DIM), np.float32)
    for i in range(0, n, batch):
        chunk = images[i:i + batch]
        m = chunk.shape[0]
        if m < batch:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - m, 0)], axis=0)
        out[i:i + m] = np.asarray(apply(jnp.asarray(chunk)))[:m]
    return out
