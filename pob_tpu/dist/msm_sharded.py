"""MSM sharded over a device mesh.

Points and scalars are partitioned along the mesh axis (the tensor-parallel
analog for this workload, SURVEY.md §2.10): each device runs the dense local
MSM over its point shard, then the per-device Jacobian partials are combined
with an all_gather + local tree reduction (point addition is not a psum-able
monoid over coordinates, so the collective moves 3*16 u32 words per device —
negligible next to the local work)."""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..prover import curve, msm
from .mesh import shard_map_norep


@functools.lru_cache(maxsize=None)
def _sharded_body(mesh: Mesh, ops, axis: str, coord_ndim: int):
    """jitted shard_map MSM body, cached per (mesh, ops, axis, point rank).

    The outer jax.jit is essential: an un-jitted shard_map runs its body
    eagerly, dispatching every primitive as its own 8-way SPMD pjit compile
    (minutes of XLA time); under jit the whole MSM is one program."""
    coord = P(axis, *([None] * (coord_ndim - 1)))

    @jax.jit
    @partial(
        shard_map_norep,
        mesh=mesh,
        in_specs=(coord, coord, coord, P(axis, None)),
        out_specs=(P(), P(), P()),
    )
    def body(px, py, pz, sc):
        # Pippenger buckets once the local shard amortizes the merge cost
        local_msm = msm.pippenger_msm if px.shape[0] >= 4096 else msm.msm
        local = local_msm(ops, (px, py, pz), sc)  # one Jacobian point
        parts = tuple(
            jax.lax.all_gather(c[None], axis)[:, 0] for c in local
        )  # (ndev, ...)
        total = curve.tree_reduce(ops, parts)
        return tuple(c[None] for c in total)

    return body


def msm_sharded(mesh: Mesh, ops, points, scalars, axis: str = "data"):
    """points: Jacobian arrays with leading axis m (divisible by mesh size);
    scalars: (m, 16). Returns a single Jacobian point (replicated)."""
    body = _sharded_body(mesh, ops, axis, points[0].ndim)
    out = body(points[0], points[1], points[2], scalars)
    return tuple(c[0] for c in out)


def msm_g1_sharded(mesh, points, scalars, axis: str = "data"):
    return msm_sharded(mesh, curve.FqOps, points, scalars, axis)


def msm_g2_sharded(mesh, points, scalars, axis: str = "data"):
    return msm_sharded(mesh, curve.Fq2Ops, points, scalars, axis)