"""Mesh construction and common shardings."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("batch",),
    devices=None,
) -> Mesh:
    """Create a mesh over available devices.

    Default: all devices on one ``("batch",)`` axis — the v5e-8 frame-DP
    layout of BASELINE.json config 4. Pass ``axis_sizes`` for 2-D layouts
    like ``((4, 2), ("batch", "y"))`` (pairs x spatial rows).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    arr = np.array(devices[: int(np.prod(axis_sizes))]).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "batch", ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
