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


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None, **kw):
    """Multi-host process-group bring-up over DCN (jax.distributed); in-slice
    collectives then ride ICI via the mesh (SURVEY.md §5.8).

    Arguments fall back to the conventional launcher environment
    (POB_COORDINATOR / POB_NUM_PROCESSES / POB_PROCESS_ID), so a multi-host
    job can be started as
        POB_COORDINATOR=host0:1234 POB_NUM_PROCESSES=4 POB_PROCESS_ID=$i ...
    on each host. No-op when no coordinator is configured (single-process).
    Returns a dict describing the resulting process group (or None)."""
    import os

    coordinator = coordinator or os.environ.get("POB_COORDINATOR")
    if coordinator is None:
        return None
    if num_processes is None and os.environ.get("POB_NUM_PROCESSES"):
        num_processes = int(os.environ["POB_NUM_PROCESSES"])
    if process_id is None and os.environ.get("POB_PROCESS_ID"):
        process_id = int(os.environ["POB_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )
    return {
        "coordinator": coordinator,
        "num_processes": num_processes,
        "process_id": process_id,
        "process_index": jax.process_index(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }
