"""Mesh + sharding utilities."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None, axis_name: str = "pop"
) -> Mesh:
    """1-D mesh over the first num_devices devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def population_sharding(mesh: Mesh, axis_name: str = "pop") -> NamedSharding:
    """Shard axis 0 (population) across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(axis_name))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
