"""Multi-host process coordination — the jax.distributed analogue of the
reference's dist_utils.py (rank/world helpers :16-67, barrier :70-82,
broadcast :160-165).

Under GSPMD most of the reference's explicit collectives disappear: gradient
all-reduce is emitted by XLA from sharding annotations, and loss logging uses
a replicated scalar. What remains host-side is process identity + object
broadcast, provided here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX (DCN). No-op for single-process runs.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are absent (mirrors the reference's env-driven init,
    diffusion/model/utils.py:333-343).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return  # single host
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:  # NOT `or`: rank 0 is falsy
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 guard (reference: accelerator.is_main_process)."""
    return jax.process_index() == 0


def broadcast_object(obj: Any) -> Any:
    """Broadcast a host-side python object from process 0 (multihost only)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj)


def sync_global_devices(tag: str = "barrier") -> None:
    """Barrier across hosts (reference: dist_utils.synchronize :70-82)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def all_gather_tensor(x: Any, axis_name: str, *, tiled: bool = True) -> Any:
    """Differentiable all-gather over a mesh axis (inside shard_map/pjit).

    The reference needs a custom autograd.Function (dist_utils.GatherLayer
    :224-247) to backprop through torch.distributed.all_gather; in JAX
    lax.all_gather is natively differentiable (its transpose is
    psum_scatter), so this is a thin alias kept for API parity.
    """
    return jax.lax.all_gather(x, axis_name, tiled=tiled)


def reduce_dict(d: dict, axis_name: str, average: bool = True) -> dict:
    """Mean/sum a dict of arrays across a mesh axis inside a pjit/shard_map
    region (reference: dist_utils.reduce_dict :131-157, an all-reduce over
    stacked values)."""
    op = jax.lax.pmean if average else jax.lax.psum
    return {k: op(v, axis_name) for k, v in d.items()}


def gather_cpu(obj: Any) -> list:
    """Gather a host-side python object from every process to all processes
    (reference: dist_utils.all_gather / all_gather_cpu :85-128,168-192 —
    pickle/file based; here jax.multihost_utils handles serialisation)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    # process_allgather stacks each *leaf* along a new leading process axis;
    # transpose that into a per-process list of objects so pytrees (dicts,
    # lists) come back with the reference's all_gather shape: a list of len
    # process_count() whose i-th entry is process i's obj.
    gathered = multihost_utils.process_allgather(obj)
    n = jax.process_count()
    return [
        jax.tree_util.tree_map(lambda leaf: leaf[i], gathered)
        for i in range(n)
    ]
