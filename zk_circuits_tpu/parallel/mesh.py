"""Device mesh helpers for the distributed prover.

The reference has no distributed runtime (rayon threads only,
/root/reference/wormhole/aggregator/src/circuits/tree.rs:92-103); the
TPU-native scaling axes are (a) polynomial batch across chips and
(b) within-polynomial coefficient sharding for the NTT/LDE (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_last(mesh: Mesh, ndim: int, axis: str = "x") -> NamedSharding:
    """Sharding that splits the last dimension over the mesh axis."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis])))


def shard_batch(mesh: Mesh, ndim: int, axis: str = "x") -> NamedSharding:
    """Sharding that splits the first (batch) dimension over the mesh axis."""
    return NamedSharding(mesh, P(*([axis] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
