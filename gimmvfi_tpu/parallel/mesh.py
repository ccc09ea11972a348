"""Device mesh + sharding helpers.

The reference's only parallelism is single-node DDP data parallelism over
NCCL (`src/utils/dist.py`, SURVEY.md §2.7). The TPU-native equivalent is a
1-D `data` mesh over ICI: parameters replicated, batches sharded on axis 0,
gradient reduction inserted by XLA from the sharding specs (no explicit
collectives). A second optional `space` axis supports spatial sharding of
high-res inference (the DS_SCALE/4K path) in later rounds.

Multi-host: `jax.distributed.initialize()` + per-host data sharding via
`data.loader.DataLoader(shard_id, num_shards)`; replicated params need no
broadcast (the sharding spec IS the reference's `dataparallel_and_sync`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    space: int = 1,
) -> Mesh:
    """1-D or 2-D mesh: ('data',) or ('data', 'space')."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // space
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Pytree of host arrays -> batch-dim-sharded global arrays.

    Single-host: plain device_put. Multi-host: each process holds only its
    slice of the global batch, assembled with
    `jax.make_array_from_process_local_data` (the per-host input sharding of
    `DistributedSampler`, reference `trainer.py:49-55`).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
