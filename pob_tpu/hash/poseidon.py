"""Batched Poseidon permutation on device (JAX, limbed Montgomery Fr).

State layout: (..., t, 16) uint32 limbs in Montgomery form. Rounds execute
under lax.scan (3 scans: leading full rounds, partial rounds, trailing full
rounds) so the compiled graph stays small; all lane math is the vectorized
field arithmetic from pob_tpu.field.limb, which batches over every leading
axis — one Poseidon instance per batch lane.

Bit-exact against pob_tpu.hash.poseidon_ref (itself verified against the
reference oracle tests/poseidon.py:1172-1209).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD
from .poseidon_params import ROUNDS_F, ROUNDS_P, mds_matrix, round_constants

_R = (1 << 256) % FR_MOD


@functools.lru_cache(maxsize=None)
def _mont_consts(t: int):
    """Round constants (n_rounds, t, 16) and MDS (t, t, 16), Montgomery form."""
    rp = ROUNDS_P[t - 2]
    n_rounds = ROUNDS_F + rp
    c = round_constants(t)
    c_mont = limb.ints_to_limbs([x * _R % FR_MOD for x in c]).reshape(n_rounds, t, limb.L)
    m = mds_matrix(t)
    m_mont = limb.ints_to_limbs(
        [m[i][j] * _R % FR_MOD for i in range(t) for j in range(t)]
    ).reshape(t, t, limb.L)
    return c_mont, m_mont


def _sigma(x):
    """x^5 in Montgomery form, vectorized over all leading axes."""
    x2 = limb.mont_sqr(FR, x)
    x4 = limb.mont_sqr(FR, x2)
    return limb.mont_mul(FR, x4, x)


def _mix(state, m_mont):
    """MDS mix: out[i] = sum_j M[i][j] * s[j]. state: (..., t, 16)."""
    t = state.shape[-2]
    prod = limb.mont_mul(FR, m_mont, state[..., None, :, :])  # (..., t, t, 16)
    acc = prod[..., 0, :]
    for j in range(1, t):
        acc = limb.add(FR, acc, prod[..., j, :])
    return acc


def poseidon_perm_mont(state):
    """Full Poseidon permutation. state: (..., t, 16) Montgomery limbs."""
    t = state.shape[-2]
    rp = ROUNDS_P[t - 2]
    c_mont, m_np = _mont_consts(t)
    m_mont = jnp.asarray(m_np)
    half_f = ROUNDS_F // 2

    def full_round(s, c_r):
        s = limb.add(FR, s, c_r)
        s = _sigma(s)
        return _mix(s, m_mont), None

    def partial_round(s, c_r):
        s = limb.add(FR, s, c_r)
        s0 = _sigma(s[..., 0:1, :])
        s = jnp.concatenate([s0, s[..., 1:, :]], axis=-2)
        return _mix(s, m_mont), None

    state, _ = jax.lax.scan(full_round, state, jnp.asarray(c_mont[:half_f]))
    state, _ = jax.lax.scan(
        partial_round, state, jnp.asarray(c_mont[half_f : half_f + rp])
    )
    state, _ = jax.lax.scan(full_round, state, jnp.asarray(c_mont[half_f + rp :]))
    return state


def poseidon_mont(inputs_mont):
    """Poseidon hash of (..., n, 16) Montgomery inputs -> (..., 16) Montgomery.

    n inputs use state width t = n+1 with lane 0 initialized to 0
    (reference tests/poseidon.py:1197: state = [0] + inputs)."""
    zero = jnp.zeros(inputs_mont.shape[:-2] + (1, limb.L), limb.U32)
    state = jnp.concatenate([zero, inputs_mont], axis=-2)
    return poseidon_perm_mont(state)[..., 0, :]


def poseidon_limbs(inputs):
    """Poseidon of canonical-form limb inputs (..., n, 16) -> canonical (..., 16)."""
    return limb.from_mont(FR, poseidon_mont(limb.to_mont(FR, inputs)))


def poseidon_host(values) -> np.ndarray:
    """Convenience host wrapper: list of python ints -> (16,) canonical limbs."""
    arr = jnp.asarray(limb.ints_to_limbs([v % FR_MOD for v in values]))
    return np.asarray(poseidon_limbs(arr))
