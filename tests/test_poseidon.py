"""Poseidon bit-exactness: golden model + batched device kernel.

Vector sources: circomlib-published value for poseidon2(1,2), plus the
reference's own smoke inputs (tests/poseidon.py __main__ and
tests/testcases/poseidon.py, recomputed via our independent golden model).
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.hash.poseidon_ref import poseidon
from pob_tpu.hash import poseidon as pos_dev

# Public known-answer: circomlib Poseidon([1,2])
KNOWN_P2_1_2 = 7853200120776062878684798364095072458815029376092732009249414926327459813530

rng = random.Random(7503)


def test_golden_known_vector():
    assert poseidon([1, 2]) == KNOWN_P2_1_2


def test_device_matches_golden_all_widths():
    for n in (1, 2, 3, 4):
        cases = [[rng.randrange(FR_MOD) for _ in range(n)] for _ in range(5)]
        cases.append([0] * n)
        cases.append([FR_MOD - 1] * n)
        cases.append([2**250] * n)
        arr = jnp.asarray(
            np.stack([limb.ints_to_limbs(c) for c in cases])
        )  # (batch, n, 16)
        out = np.asarray(jax.jit(pos_dev.poseidon_limbs)(arr))
        for i, c in enumerate(cases):
            assert limb.limbs_to_int(out[i]) == poseidon(c), (n, c)


def test_device_large_batch_consistency():
    n = 3
    batch = 64
    xs = np.random.RandomState(0).randint(0, 2**31, size=(batch, n)).astype(object)
    arr = jnp.asarray(np.stack([limb.ints_to_limbs([int(v) for v in row]) for row in xs]))
    out = np.asarray(jax.jit(pos_dev.poseidon_limbs)(arr))
    for i in range(0, batch, 17):
        assert limb.limbs_to_int(out[i]) == poseidon([int(v) for v in xs[i]])
