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
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

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


class ShardedBatchSampler:
    """Per-process view of a global batch sampler (multi-host training).

    torch-DistributedSampler semantics (the reference gets these from
    accelerate's per-rank sharding, train_scripts/train.py:310-326): every
    process constructs the IDENTICAL global batch sequence (same seed + same
    set_epoch), and rank r keeps the contiguous slice
    ``global_batch[r*B_local : (r+1)*B_local]``. Concatenating the per-rank
    slices in rank order reproduces the single-process global batch exactly,
    which is what `jax.make_array_from_process_local_data` assumes when the
    batch axis is sharded over a process-ordered mesh.

    The wrapped sampler must be built with the GLOBAL batch size
    (``B_local * num_replicas``); short (non-divisible) trailing batches are
    dropped so every rank always steps in lockstep.
    """

    def __init__(self, global_sampler, local_batch_size: int,
                 num_replicas: int, rank: int):
        assert 0 <= rank < num_replicas, (rank, num_replicas)
        self.global_sampler = global_sampler
        self.local_batch_size = local_batch_size
        self.num_replicas = num_replicas
        self.rank = rank

    def set_epoch(self, epoch: int) -> None:
        self.global_sampler.set_epoch(epoch)

    def __iter__(self) -> Iterator[List[int]]:
        lo = self.rank * self.local_batch_size
        hi = lo + self.local_batch_size
        for batch in self.global_sampler:
            if len(batch) == self.local_batch_size * self.num_replicas:
                yield batch[lo:hi]

    def __len__(self) -> int:
        # Count exactly the FULL global batches __iter__ will yield this
        # epoch — bucketed samplers can emit fewer than len(dataset)//B full
        # batches (rare-ratio leftovers / drop_last=False partials), and the
        # Trainer sizes the LR horizon and resume bookkeeping from this.
        # Deterministic: the wrapped sampler's iteration is seeded by
        # (seed, epoch), so this preview matches the subsequent __iter__.
        gb = self.local_batch_size * self.num_replicas
        return sum(1 for batch in self.global_sampler if len(batch) == gb)


class BalancedAspectRatioBatchSampler(AspectRatioBatchSampler):
    """Round-robin over ratio buckets so rare ratios still get sampled.

    Spec /root/reference/diffusion/utils/data_sampler.py:79-138:
    - per-bucket acceptance is capped at the bucket's dataset frequency
      (`ratio_nums`), i.e. quotas are frequency-proportional, not uniform;
    - after a bucket yields a batch it moves to the exhausted list and only
      becomes available again once every other available bucket has yielded
      (the available/exhausted swap at :111-112 + :121-123) — a round-robin
      rotation across buckets;
    - the epoch is padded to len(dataset)//batch_size total batches by
      re-drawing (with refill + reshuffle) from previously seen buckets
      (:126-138). We use a seeded RNG where the reference uses the global one.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.ratio_nums = (
            kwargs.get("ratio_nums") or getattr(self.dataset, "ratio_nums", None)
        )

    def __iter__(self) -> Iterator[List[int]]:
        rng = random.Random(self.seed + self.epoch)
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng.shuffle(order)
        buckets: Dict[str, List[int]] = {k: [] for k in self.aspect_ratios}
        originals: Dict[str, List[int]] = {k: [] for k in self.aspect_ratios}
        counts: Dict[str, int] = {k: 0 for k in self.aspect_ratios}
        quota = {
            k: (self.ratio_nums or {}).get(float(k), len(order))
            for k in self.aspect_ratios
        }
        available = sorted(self.valid_keys)
        exhausted: List[str] = []
        total_batches = len(order) // self.batch_size
        yielded = 0
        for idx in order:
            info = self.dataset.get_data_info(idx)
            ratio = info["height"] / info["width"]
            key = min(self.aspect_ratios.keys(), key=lambda r: abs(float(r) - ratio))
            if key not in self.valid_keys:
                continue
            if counts[key] < quota[key]:
                counts[key] += 1
                buckets[key].append(idx)
                originals[key].append(idx)
            if not available:
                available, exhausted = exhausted, []
            if key not in available:
                continue
            bucket = buckets[key]
            if len(bucket) >= self.batch_size:
                yield bucket[: self.batch_size]
                del bucket[: self.batch_size]
                yielded += 1
                exhausted.append(key)
                available.remove(key)
        # pad the epoch to the expected batch count from seen buckets
        refillable = [k for k in self.valid_keys if originals[k]]
        for _ in range(total_batches - yielded):
            if not refillable:
                break
            key = rng.choice(refillable)
            bucket = buckets[key]
            if len(bucket) >= self.batch_size:
                yield bucket[: self.batch_size]
                del bucket[: self.batch_size]
                if not bucket:
                    buckets[key] = originals[key][:]
                    rng.shuffle(buckets[key])
            else:
                buckets[key] = originals[key][:]
                rng.shuffle(buckets[key])
