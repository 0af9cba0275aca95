"""Bit-exactness tests: JAX limbed field arithmetic vs python-int reference."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD, FQ_MOD

rng = random.Random(0xB254)


def rand_elems(mod, n):
    return [rng.randrange(mod) for _ in range(n)]


@pytest.mark.parametrize("spec,mod", [(limb.FR, FR_MOD), (limb.FQ, FQ_MOD)])
def test_add_sub(spec, mod):
    xs = rand_elems(mod, 64) + [0, 1, mod - 1, mod - 2]
    ys = rand_elems(mod, 64) + [mod - 1, mod - 1, mod - 1, 1]
    a = jnp.asarray(limb.ints_to_limbs(xs))
    b = jnp.asarray(limb.ints_to_limbs(ys))
    s = np.asarray(jax.jit(lambda a, b: limb.add(spec, a, b))(a, b))
    d = np.asarray(jax.jit(lambda a, b: limb.sub(spec, a, b))(a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert limb.limbs_to_int(s[i]) == (x + y) % mod
        assert limb.limbs_to_int(d[i]) == (x - y) % mod


@pytest.mark.parametrize("spec,mod", [(limb.FR, FR_MOD), (limb.FQ, FQ_MOD)])
def test_mont_mul(spec, mod):
    xs = rand_elems(mod, 64) + [0, 1, mod - 1]
    ys = rand_elems(mod, 64) + [mod - 1, 1, mod - 1]
    R = (1 << 256) % mod
    a = jnp.asarray(limb.ints_to_limbs([x * R % mod for x in xs]))
    b = jnp.asarray(limb.ints_to_limbs([y * R % mod for y in ys]))
    out = np.asarray(jax.jit(lambda a, b: limb.mont_mul(spec, a, b))(a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert limb.limbs_to_int(out[i]) == (x * y) % mod * R % mod


def test_to_from_mont_roundtrip():
    xs = rand_elems(FR_MOD, 32) + [0, 1, FR_MOD - 1]
    a = jnp.asarray(limb.ints_to_limbs(xs))
    m = jax.jit(lambda a: limb.to_mont(limb.FR, a))(a)
    back = np.asarray(jax.jit(lambda a: limb.from_mont(limb.FR, a))(m))
    R = (1 << 256) % FR_MOD
    mm = np.asarray(m)
    for i, x in enumerate(xs):
        assert limb.limbs_to_int(mm[i]) == x * R % FR_MOD
        assert limb.limbs_to_int(back[i]) == x


def test_inv():
    xs = rand_elems(FR_MOD, 8) + [1, FR_MOD - 1]
    a = jnp.asarray(limb.ints_to_limbs(xs))
    am = limb.to_mont(limb.FR, a)
    inv = np.asarray(
        jax.jit(lambda a: limb.from_mont(limb.FR, limb.inv_mont(limb.FR, a)))(am)
    )
    for i, x in enumerate(xs):
        assert limb.limbs_to_int(inv[i]) == pow(x, FR_MOD - 2, FR_MOD)


def test_batch_inv():
    xs = rand_elems(FQ_MOD, 16) + [0, 5]  # includes a zero
    a = jnp.asarray(limb.ints_to_limbs(xs))
    am = limb.to_mont(limb.FQ, a)
    out = np.asarray(
        jax.jit(
            lambda a: limb.from_mont(limb.FQ, limb.batch_inv_mont(limb.FQ, a, axis=0))
        )(am)
    )
    for i, x in enumerate(xs):
        expect = 0 if x == 0 else pow(x, FQ_MOD - 2, FQ_MOD)
        assert limb.limbs_to_int(out[i]) == expect


def test_pow_int():
    xs = rand_elems(FR_MOD, 4)
    e = 0xDEADBEEFCAFE
    a = limb.to_mont(limb.FR, jnp.asarray(limb.ints_to_limbs(xs)))
    out = np.asarray(limb.from_mont(limb.FR, limb.mont_pow_int(limb.FR, a, e)))
    for i, x in enumerate(xs):
        assert limb.limbs_to_int(out[i]) == pow(x, e, FR_MOD)


def test_limb_rows_to_ints_round_trip():
    import random

    from pob_tpu.field import limb as lb

    rnd = random.Random(5)
    xs = [0, 1, (1 << 256) - 1] + [rnd.randrange(1 << 256) for _ in range(61)]
    arr = lb.ints_to_limbs(xs)
    assert lb.limb_rows_to_ints(arr) == xs
    assert lb.limb_rows_to_ints(arr) == [lb.limbs_to_int(r) for r in arr]


def test_byte_bit_conversions():
    xs = rand_elems(FR_MOD, 16) + [0, 1]
    a = jnp.asarray(limb.ints_to_limbs(xs))
    be = np.asarray(limb.limbs_to_be_bytes(a))
    back = np.asarray(limb.be_bytes_to_limbs(jnp.asarray(be)))
    bits = np.asarray(limb.limbs_to_bits_le(a))
    for i, x in enumerate(xs):
        assert bytes(be[i].tolist()) == x.to_bytes(32, "big")
        assert limb.limbs_to_int(back[i]) == x
        assert sum(int(b) << j for j, b in enumerate(bits[i])) == x


def test_mont_mul_pallas_matches_ref():
    """The hand-written Pallas mont_mul (field/pallas_mont.py) is bit-exact
    vs the python-int reference; on CPU the kernel runs in Pallas interpreter
    mode, on TPU it is the compiled kernel the roofline compares."""
    from pob_tpu.field.pallas_mont import mont_mul_pallas

    xs = rand_elems(FR_MOD, 24) + [0, 1, FR_MOD - 1, FR_MOD - 2]
    ys = rand_elems(FR_MOD, 24) + [FR_MOD - 1, FR_MOD - 1, FR_MOD - 1, 1]
    a = limb.to_mont(limb.FR, jnp.asarray(limb.ints_to_limbs(xs)))
    b = limb.to_mont(limb.FR, jnp.asarray(limb.ints_to_limbs(ys)))
    out = np.asarray(limb.from_mont(limb.FR, mont_mul_pallas(limb.FR, a, b, lanes=32)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert limb.limbs_to_int(out[i]) == x * y % FR_MOD
