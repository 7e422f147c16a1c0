"""Threaded prefetching data loader -> numpy batches.

Replaces torch DataLoader (reference diffusion/data/builder.py:34-57) with a
thread-pool loader: items fetched concurrently (numpy/PIL release the GIL for
IO+decode), collated into stacked numpy arrays, with a bounded prefetch queue
so host IO overlaps device compute. Supports step fast-forward for resume
(train.py:141-143).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


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
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.skip_batches = skip_batches

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    skipped = 0
                    for batch_idx in self.batch_sampler:
                        if stop.is_set():
                            return
                        if skipped < self.skip_batches:
                            skipped += 1
                            continue
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
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
