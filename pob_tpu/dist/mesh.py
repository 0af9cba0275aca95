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


def _shard_map_fn():
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map

    return shard_map


def shard_map_norep(f, *, mesh, in_specs, out_specs):
    """shard_map with the replication/varying-axes check disabled: used when an
    output is made replicated by an explicit all_gather + local reduction,
    which the static checker cannot infer (kwarg is `check_vma` on jax>=0.7,
    `check_rep` before)."""
    sm = _shard_map_fn()
    try:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def init_multihost(coordinator: str | None = None, **kw):
    """Multi-host process-group bring-up over DCN (jax.distributed); in-slice
    collectives then ride ICI via the mesh. No-op when single-process."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
