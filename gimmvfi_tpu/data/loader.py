"""Batched, shuffled, host-sharded data loading.

Replaces the reference's torch DataLoader + DistributedSampler
(`trainers/trainer.py:49-78`) with a thread-pool loader producing stacked
numpy batches: in a multi-host TPU job each host loads only its shard
(shard_id/num_shards), and batches feed `jax.device_put` directly.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any, Callable, Iterator

import numpy as np


def _stack(samples: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    """Epoch-based loader: shuffle -> shard -> parallel map -> stack.

    `dataset[index, rng]` must return a dict of numpy arrays. Deterministic
    given (seed, epoch) — the reference's DistributedSampler.set_epoch
    equivalent (`trainer.py:96`).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        num_workers: int = 8,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        root = np.random.default_rng((self.seed, self.epoch))
        if self.shuffle:
            order = root.permutation(n)
        order = order[self.shard_id :: self.num_shards]

        nb = len(self)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for b in range(nb):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                if len(idxs) == 0:
                    return
                rngs = [
                    np.random.default_rng((self.seed, self.epoch, int(i)))
                    for i in idxs
                ]
                samples = list(
                    pool.map(lambda a: self.dataset[a], zip(map(int, idxs), rngs))
                )
                yield _stack(samples)
