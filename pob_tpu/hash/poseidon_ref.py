"""Golden-model Poseidon over BN254-Fr (python ints), circomlib-compatible.

Semantics mirror the reference's oracle (tests/poseidon.py:1172-1209): state
[0, in_0..in_{t-2}], per round add-constants -> s-box (all lanes in full
rounds, lane 0 only in partial rounds) -> MDS mix; output is state[0].
"""

from __future__ import annotations

from ..field.ref import FR_MOD
from .poseidon_params import (
    ROUNDS_F,
    ROUNDS_P,
    mds_matrix,
    round_constants,
    POSEIDON_BURN_ADDRESS_PREFIX,
    POSEIDON_COIN_PREFIX,
    POSEIDON_NULLIFIER_PREFIX,
)

__all__ = [
    "poseidon",
    "poseidon2",
    "poseidon3",
    "poseidon4",
    "POSEIDON_BURN_ADDRESS_PREFIX",
    "POSEIDON_COIN_PREFIX",
    "POSEIDON_NULLIFIER_PREFIX",
]


def _sigma(x: int) -> int:
    x2 = x * x % FR_MOD
    x4 = x2 * x2 % FR_MOD
    return x4 * x % FR_MOD


def poseidon(inputs) -> int:
    """Poseidon hash of 1..8 Fr elements (ints), circomlib-compatible."""
    n = len(inputs)
    t = n + 1
    c = round_constants(t)
    m = mds_matrix(t)
    rp = ROUNDS_P[t - 2]
    state = [0] + [x % FR_MOD for x in inputs]
    for r in range(ROUNDS_F + rp):
        state = [(state[i] + c[r * t + i]) % FR_MOD for i in range(t)]
        if r < ROUNDS_F // 2 or r >= ROUNDS_F // 2 + rp:
            state = [_sigma(x) for x in state]
        else:
            state[0] = _sigma(state[0])
        state = [
            sum(m[i][j] * state[j] for j in range(t)) % FR_MOD for i in range(t)
        ]
    return state[0]


def poseidon2(a, b):
    return poseidon([a, b])


def poseidon3(a, b, c):
    return poseidon([a, b, c])


def poseidon4(a, b, c, d):
    return poseidon([a, b, c, d])
