"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's only parallelism is DDP data parallelism over NCCL
(reference: tools/train.py:51-54, configs/default_runtime.py:12-16).
TPU-native equivalent: a 1-D `data` mesh; the batch is sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduce over
ICI during jit compilation — no hand-written transport (SURVEY §2.5).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name, ))


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Shard every array in the batch pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  tree)
