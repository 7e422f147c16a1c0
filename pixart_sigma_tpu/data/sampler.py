"""Aspect-ratio bucket batch samplers.

Spec: /root/reference/diffusion/utils/data_sampler.py —
AspectRatioBatchSampler :10-77 (yield only full same-ratio batches, valid_num
threshold) and BalancedAspectRatioBatchSampler :79-138 (per-bucket quotas).
Torch-free: works over any index iterable.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Sequence


class AspectRatioBatchSampler:
    """Groups dataset indices into full batches of the same ratio bucket."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        aspect_ratios: Dict[str, Sequence[float]],
        drop_last: bool = True,
        valid_num: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        ratio_nums: Optional[Dict[float, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.aspect_ratios = aspect_ratios
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        ratio_nums = ratio_nums or getattr(dataset, "ratio_nums", None)
        if ratio_nums:
            self.valid_keys = {
                str(k) for k, v in ratio_nums.items() if v >= valid_num
            }
        else:
            self.valid_keys = set(aspect_ratios.keys())

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        buckets: Dict[str, List[int]] = {k: [] for k in self.aspect_ratios}
        for idx in order:
            info = self.dataset.get_data_info(idx)
            ratio = info["height"] / info["width"]
            key = min(self.aspect_ratios.keys(), key=lambda r: abs(float(r) - ratio))
            if key not in self.valid_keys:
                continue
            bucket = buckets[key]
            bucket.append(idx)
            if len(bucket) == self.batch_size:
                yield bucket[:]
                bucket.clear()
        if not self.drop_last:
            for bucket in buckets.values():
                if bucket:
                    yield bucket[:]

    def __len__(self) -> int:
        # lower bound: full batches only
        return max(1, len(self.dataset) // self.batch_size)


class BalancedAspectRatioBatchSampler(AspectRatioBatchSampler):
    """Caps over-represented buckets so rare ratios still get sampled.

    Spec :79-138: per-bucket quota proportional to bucket frequency.
    """

    def __iter__(self) -> Iterator[List[int]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        buckets: Dict[str, List[int]] = {k: [] for k in self.aspect_ratios}
        counts: Dict[str, int] = {k: 0 for k in self.aspect_ratios}
        total = len(order)
        quota = {
            k: max(1, int(total / max(1, len(self.valid_keys))))
            for k in self.aspect_ratios
        }
        for idx in order:
            info = self.dataset.get_data_info(idx)
            ratio = info["height"] / info["width"]
            key = min(self.aspect_ratios.keys(), key=lambda r: abs(float(r) - ratio))
            if key not in self.valid_keys or counts[key] >= quota[key]:
                continue
            counts[key] += 1
            bucket = buckets[key]
            bucket.append(idx)
            if len(bucket) == self.batch_size:
                yield bucket[:]
                bucket.clear()
