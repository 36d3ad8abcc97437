"""Mesh + sharding helpers."""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ``data`` axis (DP over ICI within a slice)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(tree, mesh: Mesh):
    """Place a host batch with leading batch dim sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
