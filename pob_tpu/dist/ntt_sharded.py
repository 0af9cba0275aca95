"""Distributed four-step NTT over a device mesh (the sequence-parallel analog
for this workload: lets the Groth16 QAP domain exceed one chip's HBM,
SURVEY.md §5.7).

Decomposition: N = N1 * N2, input viewed row-major as A[n1, n2] sharded along
n2. Then
  X[k2*N1 + k1] = sum_{n2} w^{n2 k1} W_{N2}^{n2 k2} ( sum_{n1} A[n1,n2] W_{N1}^{n1 k1} )
so: (1) local NTT over n1 columns, (2) local twiddle by w^{n2 k1},
(3) all_to_all transpose resharding k1, (4) local NTT over n2 rows.
Output layout is the transposed matrix C[k1, k2] sharded along k1 —
`untranspose_host` reorders for verification; pipelines keep the transposed
layout and fold it into the next stage."""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD
from ..prover import ntt

_R = (1 << 256) % FR_MOD


@functools.lru_cache(maxsize=None)
def _outer_twiddle(k1: int, k2: int, inverse: bool):
    """w^{n2 * k1_idx} table of shape (N1, N2) (Montgomery limbs)."""
    n = 1 << (k1 + k2)
    w = ntt.domain_root(k1 + k2)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    n1, n2 = 1 << k1, 1 << k2
    tbl = np.zeros((n1, n2, limb.L), np.uint32)
    for i in range(n1):
        for j in range(n2):
            tbl[i, j] = limb.int_to_limbs(pow(w, i * j, FR_MOD) * _R % FR_MOD)
    return tbl


def four_step_local(block, tw, k1: int, k2: int, axis: str, ndev: int,
                    inverse: bool = False):
    """The per-shard four-step body; must run inside shard_map.

    block: (N1, N2/ndev, 16) Montgomery limbs — full rows for a slice of n2
    of the matrix view A[n1, n2] of a natural-order vector x[n1*N2 + n2].
    tw: the matching local slice of _outer_twiddle(k1, k2, inverse).
    Returns (N1/ndev, N2, 16): C[k1, k2] = X[k2*N1 + k1] sharded along k1.
    With inverse=True both small transforms are inverse NTTs (their 1/N1 and
    1/N2 factors compose to the full 1/N) and tw must be the inverse table —
    the composition is the exact inverse transform."""
    n1 = 1 << k1
    small = ntt.intt if inverse else ntt.ntt
    cols = jnp.moveaxis(block, 0, -2)  # (N2/ndev, N1, 16)
    cols = small(cols, k1)  # step 1: (i)NTT over n1
    b = jnp.moveaxis(cols, -2, 0)  # (N1, N2/ndev, 16)
    b = limb.mont_mul(FR, b, tw)  # step 2: outer twiddle (local slice)
    # step 3: all_to_all transpose — reshard from n2 to k1
    b = b.reshape(ndev, n1 // ndev, b.shape[1], limb.L)
    b = jax.lax.all_to_all(b, axis, split_axis=0, concat_axis=2, tiled=False)
    b = b.reshape(n1 // ndev, 1 << k2, limb.L)
    # step 4: (i)NTT over n2 rows
    return small(b, k2)


@functools.lru_cache(maxsize=None)
def _ntt_body(mesh: Mesh, k1: int, k2: int, axis: str, inverse: bool):
    """jitted shard_map four-step NTT body (jit is essential: an un-jitted
    shard_map dispatches each primitive as its own SPMD compile)."""
    ndev = mesh.shape[axis]

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(axis, None, None),
    )
    def body(block, tw):
        return four_step_local(block, tw, k1, k2, axis, ndev, inverse)

    return body


def ntt_sharded(mesh: Mesh, a, k1: int, k2: int, axis: str = "data",
                inverse: bool = False):
    """a: (N1*N2, 16) Montgomery limbs, natural order, sharded (or shardable)
    on the mesh. Returns C of shape (N1, N2, 16) sharded along axis 0 with
    X[k2*N1 + k1] = C[k1, k2]. inverse=True computes the inverse transform
    (including the 1/n scale)."""
    n1, n2 = 1 << k1, 1 << k2
    ndev = mesh.shape[axis]
    assert n2 % ndev == 0 and n1 % ndev == 0
    a_mat = a.reshape(n1, n2, limb.L)
    twiddle = jnp.asarray(_outer_twiddle(k1, k2, inverse))
    return _ntt_body(mesh, k1, k2, axis, inverse)(a_mat, twiddle)


def untranspose_host(c) -> np.ndarray:
    """C[k1, k2] -> X[k2*N1 + k1] on host (verification helper)."""
    c = np.asarray(c)
    n1, n2 = c.shape[0], c.shape[1]
    return np.transpose(c, (1, 0, 2)).reshape(n1 * n2, limb.L)
