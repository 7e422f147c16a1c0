"""Prefetching data loader -> numpy batches (threads or processes).

Replaces torch DataLoader (reference diffusion/data/builder.py:34-57) with a
thread-pool loader: items fetched concurrently (numpy/PIL release the GIL for
IO+decode), collated into stacked numpy arrays, with a bounded prefetch queue
so host IO overlaps device compute. Supports step fast-forward for resume
(train.py:141-143).

use_processes=True swaps in a spawn-based process pool — the torch
num_workers analogue — for pipelines where per-item CPU work dwarfs the
cost of shipping the result over IPC. Measured on this host
(scripts/bench_loader.py, 256px B=64): threads reach ~86-101 img/s in
image mode (PIL decode + transform; >= the 82.5 img/s step rate) and the
PROCESS pool is strictly slower there (~30 img/s — pickling decoded pixels
dominates), so threads are the default everywhere. Loader+collate overhead
itself is negligible (null-dataset mode: >1200 img/s); feature mode is
cold-disk-bound (~2.4 MB fp16 caption npz per item), not GIL-bound.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

_PROC_DS = None


def _proc_init(ds_bytes: bytes) -> None:
    global _PROC_DS
    _PROC_DS = pickle.loads(ds_bytes)


def _proc_fetch(i: int):
    return _PROC_DS[i]


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack numpy fields; collect str fields into lists."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterates (batch_sampler x dataset) with prefetching worker threads."""

    def __init__(
        self,
        dataset,
        batch_sampler,
        num_workers: int = 8,
        prefetch: int = 4,
        skip_batches: int = 0,
        use_processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.skip_batches = skip_batches
        self.use_processes = use_processes

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def _make_pool(self):
        if not self.use_processes:
            pool = ThreadPoolExecutor(self.num_workers)
            return pool, self.dataset.__getitem__, lambda: None
        # spawn (not fork): the parent may hold TPU handles / a loaded jax.
        # Scrub the axon tunnel vars while workers start — a child python
        # would otherwise hang at interpreter start whenever anything holds
        # the TPU tunnel (sitecustomize preloads jax; see CLAUDE.md).
        import multiprocessing

        saved = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")
        }
        saved_jp = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"

        def restore():
            for k, v in saved.items():
                if v is not None:
                    os.environ[k] = v
            if saved_jp is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = saved_jp

        pool = ProcessPoolExecutor(
            self.num_workers,
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_proc_init,
            initargs=(pickle.dumps(self.dataset),),
        )
        # force all workers to spawn under the scrubbed env, then restore
        try:
            list(pool.map(int, range(self.num_workers)))
        finally:
            restore()
        return pool, _proc_fetch, lambda: None

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                pool, fetch, _ = self._make_pool()
                with pool:
                    skipped = 0
                    for batch_idx in self.batch_sampler:
                        if stop.is_set():
                            return
                        if skipped < self.skip_batches:
                            skipped += 1
                            continue
                        items = list(pool.map(fetch, batch_idx))
                        while not stop.is_set():
                            try:
                                q.put(collate(items), timeout=1.0)
                                break
                            except queue.Full:
                                continue
            except BaseException as exc:  # propagate to the consumer
                q.put(exc)
                return
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
