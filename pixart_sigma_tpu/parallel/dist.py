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
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]),
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
