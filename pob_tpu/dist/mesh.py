"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_multihost(coordinator: str | None = None, **kw):
    """Multi-host process-group bring-up over DCN (jax.distributed); in-slice
    collectives then ride ICI via the mesh. No-op when single-process."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
