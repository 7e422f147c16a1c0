"""Mesh + sharding-rule construction.

Axes:
  data  — pure data parallelism (batch sharded, params replicated)
  fsdp  — ZeRO-3-style parameter sharding (reference's FSDP path,
          train_scripts/train.py:37-41,304-309); params/opt-state sharded on
          their largest axis, all-gathered by XLA just-in-time
  tensor— reserved for megatron-style tensor parallelism (not in the
          reference; kept for scaling beyond 0.6B)

The batch is sharded over (data, fsdp) jointly, so with fsdp>1 the fsdp axis
also contributes data parallelism (exactly like torch FSDP).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: use all remaining devices
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        d, f, t = self.data, self.fsdp, self.tensor
        if d == -1:
            assert n_devices % (f * t) == 0, (n_devices, f, t)
            d = n_devices // (f * t)
        assert d * f * t == n_devices, (
            f"mesh {d}x{f}x{t} != {n_devices} devices"
        )
        return d, f, t


def build_mesh(
    config: Optional[MeshConfig] = None, devices=None
) -> Mesh:
    """Build a ('data', 'fsdp', 'tensor') mesh over the given devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    d, f, t = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(d, f, t)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tensor"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data AND fsdp axes (both carry batch)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def _fsdp_spec(shape: tuple[int, ...], fsdp_size: int, min_size: int) -> P:
    """Shard the largest divisible axis over 'fsdp'; replicate small params."""
    if fsdp_size <= 1 or not shape or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest axis divisible by the fsdp size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def param_sharding(
    params, mesh: Mesh, fsdp: bool = False, min_size: int = 2**16
):
    """A pytree of NamedShardings for the param/optimizer tree.

    fsdp=False: fully replicated (plain DP — the v1 production config; the
    0.6B denoiser fits per chip, SURVEY.md §2.2). fsdp=True: each tensor
    sharded on its largest fsdp-divisible axis.
    """
    fsdp_size = mesh.shape["fsdp"]

    def spec_for(leaf):
        if not fsdp:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _fsdp_spec(tuple(leaf.shape), fsdp_size, min_size))

    return jax.tree_util.tree_map(spec_for, params)
