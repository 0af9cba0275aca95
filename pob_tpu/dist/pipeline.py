"""Pipeline-parallel Groth16 proving across device groups.

The reference has no parallelism at all (SURVEY.md §2.10: witness generation
is one single-threaded C++ binary, Makefile:5-6); this module realizes the
"pipeline parallel" row of the strategy table for the proving workload: the
per-proof Groth16 stages

    S0: witness generation      (circuit forward pass; hash-heavy)
    S1: QAP division            (sparse matvecs + 6 NTTs -> coset evals of h)
    S2: the five MSMs           (a/b1/b2/l/h queries . witness/h)

are pinned to disjoint device groups; a stream of proof requests flows
through them with up to 3 microbatches in flight. JAX's async dispatch gives
the overlap for free: enqueueing S0(req[i+2]), S1(w[i+1]), S2(h[i]) returns
immediately and the three groups execute concurrently — no host threads, no
NCCL-style send/recv; the inter-stage handoff is a device_put of one witness
vector (nw x 16 u32) or h vector (n x 16 u32) riding ICI.

Placement uses committed arrays, not jit(device=...): each stage's constant
operands (COO matrices, MSM point queries) are device_put onto the stage's
group once at construction, activations are device_put on handoff, and XLA
runs each jitted stage where its inputs live.

The MSM group can hold several devices: S2 then point-shards its MSMs over
the group's mesh (msm_sharded), composing pipeline parallelism with the MSM
tensor-parallel analog; the witness/data batch axis (dist/mesh.py) composes
on top by running one pipeline per data-parallel replica group.
"""

from __future__ import annotations

import secrets

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..field.ref import FR_MOD
from ..prover import groth16, msm as msm_mod
from .msm_sharded import msm_g1_sharded, msm_g2_sharded

_QUERIES = ("a_query", "b1_query", "b2_query", "l_query", "h_query")


class Groth16Pipeline:
    """3-stage pipelined prover over a list of devices.

    devices: >= 3 jax devices, partitioned [S0 | S1 | S2...]: one device each
    for witness generation and QAP division, the rest shard the MSMs.

    witness_fn: callable mapping one proof request (any argument tuple) to a
    (num_wires, 16) canonical limb array; it runs on the S0 device (its
    device constants should be committed there by the caller — see
    spend_witness_stage).
    """

    def __init__(self, pk: groth16.ProvingKey, witness_fn, devices=None):
        devices = list(devices if devices is not None else jax.devices())
        assert len(devices) >= 3, "pipeline needs >= 3 devices"
        self.pk = pk
        self._d0, self._d1 = devices[0], devices[1]
        self._msm_devs = devices[2:]
        self._wit_fn = witness_fn

        # stage 1 constants: the COO matrices, committed to d1
        mats1 = tuple(
            tuple(jax.device_put(x, self._d1) for x in m) for m in pk.mats
        )
        self._h_fn = jax.jit(
            lambda w: groth16._compute_h_traced(pk.k, mats1, w)
        )

        # stage 2 constants: MSM queries on the MSM group
        ndev = len(self._msm_devs)
        self._msm_mesh = (
            Mesh(np.array(self._msm_devs), ("msm",)) if ndev > 1 else None
        )
        self._q = {}
        for name in _QUERIES:
            pts = getattr(pk, name)
            m = int(pts[0].shape[0])
            if ndev > 1:
                # zero-pad to a group multiple: padding points carry the
                # infinity encoding (z = 0) and scalar 0 — no contribution
                mp = -(-max(m, 1) // ndev) * ndev
                if mp != m:
                    pts = tuple(
                        jnp.concatenate(
                            [c, jnp.zeros((mp - m,) + c.shape[1:], c.dtype)], 0
                        )
                        for c in pts
                    )
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = lambda c: NamedSharding(
                    self._msm_mesh, P("msm", *([None] * (c.ndim - 1)))
                )
                pts = tuple(jax.device_put(c, sh(c)) for c in pts)
            else:
                pts = tuple(jax.device_put(c, self._msm_devs[0]) for c in pts)
            self._q[name] = (pts, m)

        if ndev == 1:
            q = self._q

            @jax.jit
            def msm_stage(w, h):
                npub = pk.num_public
                return (
                    msm_mod.msm_g1(q["a_query"][0], w),
                    msm_mod.msm_g1(q["b1_query"][0], w),
                    msm_mod.msm_g2(q["b2_query"][0], w),
                    msm_mod.msm_g1(q["l_query"][0], w[npub + 1 :])
                    if q["l_query"][1]
                    else None,
                    msm_mod.msm_g1(q["h_query"][0], h),
                )

            self._msm_fn = msm_stage
        else:

            def pad_sc(s, m):
                mp = -(-max(m, 1) // ndev) * ndev
                if mp == m:
                    return s
                return jnp.concatenate(
                    [s, jnp.zeros((mp - s.shape[0], 16), s.dtype)], 0
                )

            def msm_stage(w, h):
                npub = pk.num_public
                out = []
                for name, f, sc in (
                    ("a_query", msm_g1_sharded, w),
                    ("b1_query", msm_g1_sharded, w),
                    ("b2_query", msm_g2_sharded, w),
                    ("l_query", msm_g1_sharded, w[npub + 1 :]),
                    ("h_query", msm_g1_sharded, h),
                ):
                    pts, m = self._q[name]
                    out.append(
                        f(self._msm_mesh, pts, pad_sc(sc, m), axis="msm")
                        if m
                        else None
                    )
                return tuple(out)

            self._msm_fn = msm_stage

    def _to_msm(self, a):
        if self._msm_mesh is None:
            return jax.device_put(a, self._msm_devs[0])
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(a, NamedSharding(self._msm_mesh, P()))

    def prove_stream(self, inputs, rs=None):
        """inputs: sequence of witness_fn argument tuples. Returns the list of
        (A, B2, C) host affine proofs in order; at steady state the three
        stage groups work on three consecutive proofs concurrently."""
        inputs = list(inputs)
        n = len(inputs)
        if rs is None:
            rs = [
                (secrets.randbelow(FR_MOD), secrets.randbelow(FR_MOD))
                for _ in range(n)
            ]
        wq, hq, sq, out = [], [], [], []
        for t in range(n + 3):
            if t >= 3:  # drain: oldest MSM sums -> final proof (host tail)
                sums, (r, s) = sq.pop(0)
                out.append(groth16.finish_proof(self.pk, sums, r, s))
            if hq:  # S2: enqueue the five MSMs
                w_m, h_m, meta = hq.pop(0)
                sq.append((self._msm_fn(w_m, h_m), meta))
            if wq:  # S1: enqueue QAP division on d1
                w, meta = wq.pop(0)
                w_d1 = jax.device_put(w, self._d1)
                h = self._h_fn(w_d1)
                hq.append((self._to_msm(w_d1), self._to_msm(h), meta))
            if t < n:  # S0: witness generation on d0
                w = jnp.asarray(self._wit_fn(*inputs[t]))
                wq.append((jax.device_put(w, self._d0), rs[t]))
        return out


def spend_witness_stage():
    """Witness stage function for the Spend circuit: maps (burn_key, balance,
    withdrawn, extra) python ints to the (num_wires, 16) canonical witness."""
    from ..r1cs.spend_circuit import spend_full_witness

    def fn(burn_key, balance, withdrawn, extra):
        return np.asarray(spend_full_witness(burn_key, balance, withdrawn, extra))[0]

    return fn
