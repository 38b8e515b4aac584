"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def data_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    The batch axis of training data and of cascade tile batches shards over
    this axis; parameters stay replicated. For the 7.8M-parameter 40x40 CNN,
    pure DP is the right decomposition — there is no sequence dimension to
    shard (SURVEY.md section 2, parallelism inventory); the cascade's tile
    axis is this domain's spatial analogue and uses the same mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def grid_mesh(shape: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """N-D mesh (e.g. ('data', 'tile') for cascade runs that shard both the
    scene batch and the tile axis)."""
    devices = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(devices, tuple(axis_names))
