"""Device mesh / sharding helpers for multi-chip execution.

The reference is single-process, single-device (``main.py:153``); scaling
here is jax-native SPMD: a 1-D ``data`` mesh, batches sharded over it,
parameters replicated, and XLA inserting the gradient ``psum`` over ICI.
Search workloads add an ``islands`` axis (``search/islands.py``) over the
same physical mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays on the mesh with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params / opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
