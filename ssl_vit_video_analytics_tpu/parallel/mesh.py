"""Device mesh construction and sharding helpers.

The reference has no distribution at all (SURVEY.md §2); here the mesh is a
first-class object. Axis conventions:

- ``data``   — batch (data-parallel) axis; batches are sharded on it, params
               replicated.
- ``client`` — federated-clients axis; per-client params AND per-client data
               are sharded on it, FedAvg aggregation is a weighted psum over
               it (riding ICI instead of the reference's in-process
               state-dict averaging, ref: src/federated/fed_loop.py:99-119).
- ``model``  — reserved tensor-parallel axis for wide layers.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh from {axis_name: size}; -1 means 'all remaining devices'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    axes = dict(axes or {"data": n})
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {axes} needs {total} devices, have {n}"
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch PyTree with its leading dim sharded over ``axis``."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
