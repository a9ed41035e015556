"""Device mesh + sharding layout.

The workload is data-parallel (the reference uses DDP only — SURVEY §2),
so the canonical mesh is 1-D over a ``data`` axis with params replicated and
the batch sharded on axis 0; gradients are reduced by XLA-inserted
collectives over ICI when the jitted train step consumes a data-sharded
batch and produces replicated params.  A ``model`` axis is kept in the mesh
so tensor-parallel layouts can be layered in without changing call sites.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (steps, batch, ...) stack fed to a multi-step
    dispatch: the batch axis (axis 1) shards over ``data``, the scanned
    steps axis stays unsharded."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
