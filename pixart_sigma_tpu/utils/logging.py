"""Rank-aware logging + JSONL metrics.

Spec: /root/reference/diffusion/utils/logger.py (rank-0 file handler, other
ranks at ERROR) and the train loop's LogBuffer/ETA accounting
(train.py:129-207). Metrics go to stdout + a JSONL file (greppable,
plotting-friendly) instead of mmcv's TextLogger; TensorBoard hooks can layer
on top.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax

_loggers: Dict[str, logging.Logger] = {}


def get_logger(name: str = "pixart", work_dir: Optional[str] = None) -> logging.Logger:
    if name in _loggers:
        return _loggers[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    is_main = jax.process_index() == 0
    stream = logging.StreamHandler()
    stream.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
    )
    stream.setLevel(logging.INFO if is_main else logging.ERROR)
    logger.addHandler(stream)
    if work_dir and is_main:
        os.makedirs(work_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(work_dir, "train_log.log"))
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(fh)
    _loggers[name] = logger
    return logger


class LogBuffer:
    """Windowed averaging of scalar metrics (mmcv LogBuffer semantics)."""

    def __init__(self) -> None:
        self._vals: Dict[str, list] = defaultdict(list)
        self.output: Dict[str, float] = {}

    def update(self, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self._vals[k].append(float(v))

    def average(self) -> None:
        self.output = {
            k: sum(v) / max(1, len(v)) for k, v in self._vals.items()
        }

    def clear(self) -> None:
        self._vals.clear()


class MetricsWriter:
    """Append-only JSONL metrics stream (rank 0 only)."""

    def __init__(self, work_dir: str, filename: str = "metrics.jsonl"):
        self.path = os.path.join(work_dir, filename)
        self.enabled = jax.process_index() == 0
        if self.enabled:
            os.makedirs(work_dir, exist_ok=True)

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class Tracker:
    """Optional experiment tracker (reference train.py:259-267,457-462 uses
    accelerate's --report_to for TensorBoard/W&B scalars + validation images).

    Backend 'tensorboard' uses torch.utils.tensorboard; anything else (or an
    unavailable backend) degrades to a no-op so training never depends on it.
    """

    def __init__(self, work_dir: str, report_to: Optional[str] = None):
        self._writer = None
        if report_to == "tensorboard" and jax.process_index() == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(
                    log_dir=os.path.join(work_dir, "tb")
                )
            except Exception:  # pragma: no cover - missing optional dep
                get_logger().warning(
                    "report_to='tensorboard' requested but tensorboard is "
                    "unavailable; tracker disabled"
                )
        elif report_to and report_to != "tensorboard":
            get_logger().warning(
                f"report_to={report_to!r} not supported (only 'tensorboard'); "
                "tracker disabled"
            )

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def add_scalars(self, step: int, metrics: Dict[str, Any]) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            self._writer.add_scalar(k, float(v), global_step=step)

    def add_images(self, step: int, tag: str, images) -> None:
        """images: [N, H, W, C] float in [0, 1]."""
        if self._writer is None:
            return
        import numpy as np

        self._writer.add_images(
            tag, np.asarray(images), global_step=step, dataformats="NHWC"
        )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()


class SimpleTimer:
    """ETA logger for long loops (reference misc.py:85-104)."""

    def __init__(self, total: int, log_interval: int = 1, desc: str = "work"):
        self.total = total
        self.log_interval = log_interval
        self.desc = desc
        self.count = 0
        self.start = time.time()

    def log(self) -> Optional[str]:
        self.count += 1
        if self.count % self.log_interval:
            return None
        elapsed = time.time() - self.start
        rate = self.count / max(elapsed, 1e-9)
        eta = (self.total - self.count) / max(rate, 1e-9)
        return (
            f"{self.desc}: {self.count}/{self.total} "
            f"({rate:.2f} it/s, eta {eta / 60:.1f} min)"
        )
