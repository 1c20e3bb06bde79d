"""Device mesh + sharding helpers: SPMD data parallelism over ICI.

This replaces the reference's entire distributed stack — ``nn.DataParallel``
scatter/gather (``code/main.py:530-548``), per-GPU batch padding
(``main.py:256-281``), and the 740-LoC ``sync_batchnorm`` thread/queue
rendezvous (``code/sync_batchnorm/``) — with jax.sharding annotations.  XLA
inserts the gradient all-reduce over ICI; cross-replica batch-norm moments
are a ``pmean`` (see ``im23d_tpu.models.norm``).

On a single chip the same code runs with a 1-device mesh; multi-host DCN
scaling is ``jax.distributed`` + the same annotations.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch_pytree(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put every leaf of a host batch with its batch axis sharded."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
