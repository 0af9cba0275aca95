"""Mesh-sharded Groth16 prove: ONE proof partitioned across a device mesh.

This is the north-star sharding plan (SURVEY.md §2.10/§5.7) applied to the
prover itself, for proofs whose proving key / QAP domain exceed one chip:

- the five MSM queries (a, b1, b2, l, h) are point-sharded along the mesh
  axis; each device reduces its shard locally and the per-device Jacobian
  partials are combined with an all_gather + log-depth tree reduction
  (dist/msm_sharded.py) over ICI;
- the QAP h computation — inverse NTT, coset shift, forward NTT for each of
  A.w, B.w, C.w — runs as four-step transforms whose transpose stage is an
  all_to_all over the mesh (dist/ntt_sharded.four_step_local), so no device
  ever holds a full 2^k-point polynomial.

Layout bookkeeping: the four-step returns the transposed matrix C[k1, k2] =
X[k2*N1 + k1] sharded along k1. Chaining inverse -> coset scale -> forward
without any re-layout collective works because (a) the coset scale is
elementwise (table precomputed in the transposed layout), and (b) the local
transpose of the k1-sharded block IS the column-sharded input the next
four-step wants. The final coset evals come out in the doubly-permuted order
q -> (q % N1) * N2 + q // N1; the h-query points are gathered through that
permutation once at key-sharding time, so the MSM pairs scalars and points
correctly with zero per-proof data movement.

The reference has no distributed anything (witness generation is one C++
binary, Makefile:5-6); this module exists for BASELINE.json's north star."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD
from ..prover import curve, msm, ntt
from ..prover.groth16 import ProvingKey, finish_proof, sparse_matvec_mont
from .mesh import shard_map_norep
from .msm_sharded import msm_sharded
from .ntt_sharded import _outer_twiddle, four_step_local

_R = (1 << 256) % FR_MOD


def _split_k(k: int, ndev: int) -> tuple[int, int]:
    """k = k1 + k2 with both 2^k1 and 2^k2 divisible by ndev."""
    d = max(0, (ndev - 1).bit_length())
    assert k >= 2 * d, (
        f"domain 2^{k} too small to 2D-decompose over {ndev} devices; "
        f"need k >= {2 * d}"
    )
    k1 = max((k + 1) // 2, d)
    return k1, k - k1


@functools.lru_cache(maxsize=None)
def _coset_table_transposed(k1: int, k2: int, shift: int):
    """s^j * R in the transposed four-step layout: T[i1, i2] = s^{i2*N1+i1}."""
    n1, n2 = 1 << k1, 1 << k2
    pows = []
    acc = 1
    for _ in range(n1 * n2):
        pows.append(acc * _R % FR_MOD)
        acc = acc * shift % FR_MOD
    flat = limb.ints_to_limbs(pows)  # natural order j
    idx = (np.arange(n2)[None, :] * n1 + np.arange(n1)[:, None]).reshape(-1)
    return flat[idx].reshape(n1, n2, limb.L)


@functools.lru_cache(maxsize=None)
def _h_body(mesh: Mesh, k1: int, k2: int, axis: str):
    """Sharded twin of groth16._compute_h_traced: domain evals of A.w and
    B.w (C.w = their pointwise product) -> canonical coset evals of
    A.B - C in the doubly-permuted layout, sharded along the leading axis."""
    ndev = mesh.shape[axis]
    col = P(None, axis, None)

    @jax.jit
    @partial(
        shard_map_norep,
        mesh=mesh,
        in_specs=(col, col, col, P(axis, None, None), col),
        out_specs=P(axis, None, None),
    )
    def body(aw, bw, tw_inv, coset_tw, tw_fwd):
        cw = limb.mont_mul(FR, aw, bw)  # C on the domain = A.B pointwise

        def to_coset(x):
            # inverse four-step: coeffs in transposed layout (N1/ndev, N2)
            ca = four_step_local(x, tw_inv, k1, k2, axis, ndev, inverse=True)
            ca = limb.mont_mul(FR, ca, coset_tw)  # elementwise coset shift
            # local transpose: (N2, N1/ndev) == the column-sharded natural
            # input of the (k2, k1) four-step (see module docstring)
            m = jnp.swapaxes(ca, 0, 1)
            return four_step_local(m, tw_fwd, k2, k1, axis, ndev)

        ea = to_coset(aw)
        eb = to_coset(bw)
        ec = to_coset(cw)
        h = limb.sub(FR, limb.mont_mul(FR, ea, eb), ec)
        return limb.from_mont(FR, h)

    return body


@dataclass
class ShardedProvingKey:
    pk: ProvingKey
    mesh: Mesh
    axis: str
    k1: int
    k2: int
    queries: dict  # name -> (sharded Jacobian points, padded m)


def _pad_shard_points(points, mesh, axis, perm=None, pad_to: int = 0):
    """Pad a device Jacobian batch to a multiple of the mesh size (at least
    pad_to) with infinity and device_put it sharded along the leading axis."""
    ndev = mesh.shape[axis]
    m = int(points[0].shape[0])
    if perm is not None:
        points = tuple(jnp.take(c, jnp.asarray(perm), axis=0) for c in points)
    mp = -(-max(m, 1, pad_to) // ndev) * ndev
    if mp != m:
        inf = curve.infinity(
            curve.FqOps if points[0].ndim == 2 else curve.Fq2Ops, (mp - m,)
        )
        points = tuple(
            jnp.concatenate([c, i], axis=0) for c, i in zip(points, inf)
        )
    spec = P(axis, *([None] * (points[0].ndim - 1)))
    sharded = tuple(
        jax.device_put(c, NamedSharding(mesh, spec)) for c in points
    )
    return sharded, mp


def shard_pk(pk: ProvingKey, mesh: Mesh, axis: str = "data",
             pool_shapes: bool = False) -> ShardedProvingKey:
    """Partition a ProvingKey's MSM queries over the mesh (the one-time key
    distribution step; per-proof work then only moves Jacobian partials and
    NTT transpose tiles across ICI).

    pool_shapes pads every query to one shared size (the max across queries)
    so all G1 MSMs reuse ONE compiled shard_map program instead of one per
    distinct query length — the right trade when compile latency dominates
    (dryruns, small domains); the cost is MSM work over the infinity pad."""
    ndev = mesh.shape[axis]
    k1, k2 = _split_k(pk.k, ndev)
    n1, n2 = 1 << k1, 1 << k2
    q = np.arange(1 << pk.k)
    perm = (q % n1) * n2 + q // n1  # h-eval layout after the double four-step
    pad_to = 0
    if pool_shapes:
        pad_to = max(
            int(p[0].shape[0])
            for p in (pk.a_query, pk.b1_query, pk.b2_query, pk.l_query,
                      pk.h_query)
        )
    queries = {
        "a": _pad_shard_points(pk.a_query, mesh, axis, pad_to=pad_to),
        "b1": _pad_shard_points(pk.b1_query, mesh, axis, pad_to=pad_to),
        "b2": _pad_shard_points(pk.b2_query, mesh, axis, pad_to=pad_to),
        "l": _pad_shard_points(pk.l_query, mesh, axis, pad_to=pad_to),
        "h": _pad_shard_points(pk.h_query, mesh, axis, perm=perm,
                               pad_to=pad_to),
    }
    return ShardedProvingKey(pk=pk, mesh=mesh, axis=axis, k1=k1, k2=k2,
                             queries=queries)


def _pad_scalars(sc, mp: int):
    m = int(sc.shape[0])
    if m == mp:
        return sc
    return jnp.concatenate([sc, jnp.zeros((mp - m, limb.L), limb.U32)], axis=0)


def compute_h_sharded(spk: ShardedProvingKey, witness):
    """Canonical coset evals of A.B - C, in the permuted sharded layout that
    matches spk.queries['h']."""
    pk, mesh, axis = spk.pk, spk.mesh, spk.axis
    k1, k2 = spk.k1, spk.k2
    n = 1 << pk.k
    aw = sparse_matvec_mont(pk.mats[0], witness, n).reshape(1 << k1, 1 << k2, limb.L)
    bw = sparse_matvec_mont(pk.mats[1], witness, n).reshape(1 << k1, 1 << k2, limb.L)
    shift = ntt.domain_root(pk.k + 1)
    body = _h_body(mesh, k1, k2, axis)
    h = body(
        aw,
        bw,
        jnp.asarray(_outer_twiddle(k1, k2, True)),
        jnp.asarray(_coset_table_transposed(k1, k2, shift)),
        jnp.asarray(_outer_twiddle(k2, k1, False)),
    )
    return h.reshape(n, limb.L)


def prove_sharded(spk: ShardedProvingKey, witness_limbs,
                  r: int | None = None, s: int | None = None):
    """One Groth16 proof computed across the mesh. witness_limbs:
    (num_wires, 16) canonical limbs with w[0] == 1. Mesh-shape invariant:
    the proof depends only on (witness, r, s)."""
    pk, mesh, axis = spk.pk, spk.mesh, spk.axis
    w = jnp.asarray(witness_limbs)
    npub = pk.num_public
    h = compute_h_sharded(spk, w)

    def run(name, ops, scalars):
        pts, mp = spk.queries[name]
        return msm_sharded(mesh, ops, pts, _pad_scalars(scalars, mp), axis)

    a_sum = run("a", curve.FqOps, w)
    b1_sum = run("b1", curve.FqOps, w)
    b2_sum = run("b2", curve.Fq2Ops, w)
    c_l = (
        run("l", curve.FqOps, w[npub + 1 :])
        if int(pk.l_query[0].shape[0]) > 0
        else None
    )
    c_h = run("h", curve.FqOps, h)
    return finish_proof(pk, (a_sum, b1_sum, b2_sum, c_l, c_h), r, s)
