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
    seq: int = 1  # sequence/context parallelism (token dim of activations)

    def resolve(self, n_devices: int) -> tuple[int, int, int, int]:
        d, f, t, s = self.data, self.fsdp, self.tensor, self.seq
        if d == -1:
            assert n_devices % (f * t * s) == 0, (n_devices, f, t, s)
            d = n_devices // (f * t * s)
        assert d * f * t * s == n_devices, (
            f"mesh {d}x{f}x{t}x{s} != {n_devices} devices"
        )
        return d, f, t, s


def build_mesh(
    config: Optional[MeshConfig] = None, devices=None
) -> Mesh:
    """Build a ('data', 'fsdp', 'tensor', 'seq') mesh over the devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    d, f, t, s = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(d, f, t, s)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tensor", "seq"))


def seq_axis_size(axis: str = "seq") -> int:
    """Size of the ambient sequence-parallel mesh axis (1 if none active).

    Reads the abstract mesh installed by `jax.set_mesh(mesh)` — usable from
    inside jitted model code to decide trace-time layout/impl choices.
    Inside a shard_map over the axis (axis type Manual) the axis is already
    consumed, so this returns 1 — dispatch code can never re-redirect into
    a nested shard_map.
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return 1
    if am is None or am.empty or axis not in am.axis_names:
        return 1
    if _axis_is_manual(am, axis):
        return 1
    return int(am.shape[axis])


def _axis_is_manual(am, axis: str) -> bool:
    try:
        idx = am.axis_names.index(axis)
        # str(AxisType.Manual) is "AxisType.Manual" (enum repr), so compare
        # against the enum member itself, falling back to a suffix match
        manual = getattr(jax.sharding.AxisType, "Manual", None)
        t = am.axis_types[idx]
        return t == manual or str(t).endswith("Manual")
    except Exception:
        return False


def batch_shard_axes(axis: str = "seq") -> tuple[str, ...]:
    """Mesh axes the batch dim is sharded over alongside a seq shard_map.

    Returns the ('data', 'fsdp') axes present in the ambient mesh with
    size > 1 and not Manual — the axes whose batch sharding a seq-axis
    shard_map must declare in its in_specs so GSPMD does not all-gather the
    batch and compute it redundantly per data group (round-4 ADVICE medium).
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return ()
    if am is None or am.empty:
        return ()
    return tuple(
        a
        for a in ("data", "fsdp")
        if a != axis and a in am.axis_names and int(am.shape[a]) > 1
        and not _axis_is_manual(am, a)
    )


def seq_constraint(x, dim: int = 1, axis: str = "seq"):
    """Constrain `dim` (the token dim) of x to shard over the ambient mesh's
    sequence axis; no-op when no mesh with that axis is active.

    This is the whole sequence-parallelism mechanism: annotate the token dim
    at block boundaries and let GSPMD split every per-token op and insert
    the K/V collectives for attention (scaling-book recipe — shardings in,
    collectives out). The reference has no sequence/context parallelism
    (SURVEY.md §2.2: absent); this is TPU-native headroom for 2K/4K grids.
    """
    if seq_axis_size(axis) <= 1:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


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


# Megatron-style tensor-parallel rules, keyed on trailing param-path
# components (matches both the param tree and optimizer-moment trees, whose
# leaves mirror the param paths). Column-parallel kernels shard their OUTPUT
# dim; row-parallel kernels shard their INPUT dim, and GSPMD emits the
# all-reduce after them. Not in the reference (SURVEY §2.2: TP absent) —
# this is the scaling path for >0.6B variants.
#
# Known limitation: the fused qkv / kv_linear output dims are sharded as
# contiguous chunks, which do not align with the q/k/v concat or head
# boundaries — GSPMD keeps the numerics exact but inserts a resharding
# collective after those matmuls. Head-aligned TP needs the projections
# split into separate q/k/v kernels (checkpoint-layout change; tracked for
# a future round, relevant only beyond 0.6B).
_TP_COL = (  # shard last dim (output features); bias sharded too
    ("attn", "qkv", "kernel"),
    ("attn", "qkv", "bias"),
    ("cross_attn", "q_linear", "kernel"),
    ("cross_attn", "q_linear", "bias"),
    ("cross_attn", "kv_linear", "kernel"),
    ("cross_attn", "kv_linear", "bias"),
    ("mlp", "fc1", "kernel"),
    ("mlp", "fc1", "bias"),
)
_TP_ROW = (  # shard dim -2 (input features); bias replicated
    ("attn", "proj", "kernel"),
    ("cross_attn", "proj", "kernel"),
    ("mlp", "fc2", "kernel"),
)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def _tp_axis(path_names: tuple[str, ...], ndim: int):
    """Return the dim to shard over 'tensor' for this param path, or None."""
    for suffix in _TP_COL:
        if path_names[-len(suffix):] == suffix:
            return ndim - 1
    for suffix in _TP_ROW:
        if path_names[-len(suffix):] == suffix:
            return ndim - 2 if ndim >= 2 else None
    return None


def param_sharding(
    params,
    mesh: Mesh,
    fsdp: bool = False,
    tensor: bool = False,
    min_size: int = 2**16,
):
    """A pytree of NamedShardings for the param/optimizer tree.

    fsdp=False, tensor=False: fully replicated (plain DP — the v1 production
    config; the 0.6B denoiser fits per chip, SURVEY.md §2.2).
    fsdp=True: each tensor sharded on its largest fsdp-divisible axis.
    tensor=True: megatron TP on attention/MLP kernels (column/row rules
    above); composes with fsdp, which then takes the largest REMAINING axis.
    """
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape["tensor"]

    def spec_for(path, leaf):
        shape = tuple(leaf.shape)
        spec = [None] * len(shape)
        if tensor and tp_size > 1 and shape:
            axis = _tp_axis(_path_names(path), len(shape))
            if axis is not None and shape[axis] % tp_size == 0:
                spec[axis] = "tensor"
        if fsdp and fsdp_size > 1 and shape and int(np.prod(shape)) >= min_size:
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for ax in order:
                if spec[ax] is None and shape[ax] % fsdp_size == 0:
                    spec[ax] = "fsdp"
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_for, params)
