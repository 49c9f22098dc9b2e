"""Epoch samplers (reference: data/dali/sampler.py:71-713).

Contract: ``epoch_batches(epoch)`` returns the list of *global* batches for
an epoch; each global batch is a numpy index array of length
``batch_size * world_size`` which data-parallel rank r slices as
``batch[r::world_size]`` (round-robin, mirroring the reference's
``_to_dali_order`` sharding, sampler.py:321-360). All ranks derive identical
epochs from the shared seed, so no file-list broadcast is needed.

Reference behaviours kept:
- **pessimistic first batch**: the first batch of epoch 0 contains the
  longest utterances so OOM fails immediately (sampler.py:286-316);
- **BucketingSampler**: shuffle -> sort by duration -> chunk into buckets of
  ``batch_size * num_buckets`` -> shuffle within bucket -> batch -> shuffle
  batches (sampler.py:645-713);
- mid-epoch resume by dropping the first ``resume_step`` batches.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class Sampler:
    def __init__(
        self,
        durations: Sequence[float],
        batch_size: int,
        world_size: int = 1,
        seed: int = 0,
        drop_last: bool = True,
        pessimistic_first_batch: bool = True,
    ):
        self.durations = np.asarray(durations, dtype=np.float64)
        self.batch_size = batch_size
        self.world_size = world_size
        self.global_batch = batch_size * world_size
        self.seed = seed
        self.drop_last = drop_last
        self.pessimistic_first_batch = pessimistic_first_batch

    def _order(self, epoch: int, rng: np.random.Generator) -> np.ndarray:
        raise NotImplementedError

    def epoch_batches(self, epoch: int, resume_step: int = 0) -> List[np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch))
        order = self._order(epoch, rng)
        n = (len(order) // self.global_batch) * self.global_batch
        if n == 0 and (self.drop_last or len(order) == 0):
            return []
        batches = [
            order[i : i + self.global_batch] for i in range(0, n, self.global_batch)
        ]
        if not self.drop_last and n < len(order):
            batches.append(order[n:])
        if not batches:
            return []
        if self.pessimistic_first_batch and epoch == 0 and resume_step == 0:
            # Prepend a batch of the longest utterances (fail-fast OOM probe);
            # it replaces the first batch rather than adding a step.
            longest = np.argsort(self.durations)[-self.global_batch:]
            batches[0] = longest
        return batches[resume_step:]

    def shard(self, batch: np.ndarray, rank: int) -> np.ndarray:
        return batch[rank :: self.world_size]


class SimpleSampler(Sampler):
    """In-manifest order (reference SimpleSampler)."""

    def _order(self, epoch, rng):
        return np.arange(len(self.durations))


class SortedSampler(Sampler):
    """Sorted by duration — minimal padding waste, no shuffling (val)."""

    def _order(self, epoch, rng):
        return np.argsort(self.durations, kind="stable")


class RandomSampler(Sampler):
    def _order(self, epoch, rng):
        return rng.permutation(len(self.durations))


class BucketingSampler(Sampler):
    def __init__(self, *args, num_buckets: int = 6, **kw):
        super().__init__(*args, **kw)
        self.num_buckets = num_buckets

    def _order(self, epoch, rng):
        n = len(self.durations)
        perm = rng.permutation(n)
        # Stable sort of the shuffled order by duration.
        srt = perm[np.argsort(self.durations[perm], kind="stable")]
        bucket_size = self.global_batch * self.num_buckets
        out_batches = []
        for s in range(0, n, bucket_size):
            bucket = srt[s : s + bucket_size].copy()
            rng.shuffle(bucket)
            for b in range(0, len(bucket), self.global_batch):
                chunk = bucket[b : b + self.global_batch]
                if len(chunk) == self.global_batch or not self.drop_last:
                    out_batches.append(chunk)
        order = np.arange(len(out_batches))
        rng.shuffle(order)
        return np.concatenate([out_batches[i] for i in order]) if out_batches else np.array([], np.int64)
