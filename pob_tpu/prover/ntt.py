"""Radix-2 NTT over BN254-Fr on device (batched, Montgomery limbs).

Used for the QAP witness division h(x) = (A(x)B(x) - C(x)) / Z(x): evaluate
on a multiplicative coset of the 2^k domain where Z is the nonzero constant
g^n - 1, divide pointwise, and transform back.

The transform is an iterative Cooley-Tukey with a static bit-reversal gather
followed by k butterfly stages of static-shape mont_mul/add/sub — XLA-friendly
(no dynamic control flow), and the per-stage twiddle tables are precomputed
host-side. 2-adicity of Fr is 28 (r - 1 = 2^28 * odd), generator 5."""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD

TWO_ADICITY = 28
_ODD = (FR_MOD - 1) >> TWO_ADICITY
ROOT_OF_UNITY = pow(5, _ODD, FR_MOD)  # order 2^28
_R = (1 << 256) % FR_MOD


def domain_root(k: int) -> int:
    """Primitive 2^k-th root of unity."""
    assert k <= TWO_ADICITY
    return pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - k), FR_MOD)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(k: int, inverse: bool):
    """Per-stage Montgomery twiddle tables for a 2^k transform."""
    n = 1 << k
    w = domain_root(k)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    tables = []
    for s in range(k):
        half = 1 << s
        step = n >> (s + 1)
        tw = [pow(w, j * step, FR_MOD) * _R % FR_MOD for j in range(half)]
        tables.append(limb.ints_to_limbs(tw))  # (half, 16)
    return tables


@functools.lru_cache(maxsize=None)
def _bitrev(k: int):
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{k}b")[::-1], 2) if k else 0
    return rev


def _transform(a, k: int, inverse: bool):
    n = 1 << k
    a = jnp.take(a, jnp.asarray(_bitrev(k)), axis=-2)
    tables = _stage_twiddles(k, inverse)
    for s in range(k):
        half = 1 << s
        block = half * 2
        tw = jnp.asarray(tables[s])  # (half, 16)
        shaped = a.reshape(a.shape[:-2] + (n // block, 2, half, limb.L))
        u = shaped[..., 0, :, :]
        v = limb.mont_mul(FR, shaped[..., 1, :, :], tw)
        out = jnp.stack([limb.add(FR, u, v), limb.sub(FR, u, v)], axis=-3)
        a = out.reshape(a.shape[:-2] + (n, limb.L))
    return a


def ntt(a, k: int):
    """Forward NTT. a: (..., 2^k, 16) Montgomery limbs, natural order in and out."""
    return _transform(a, k, inverse=False)


def intt(a, k: int):
    """Inverse NTT (includes the 1/n scaling)."""
    out = _transform(a, k, inverse=True)
    n_inv = pow(1 << k, FR_MOD - 2, FR_MOD) * _R % FR_MOD
    return limb.mont_mul(FR, out, jnp.asarray(limb.int_to_limbs(n_inv)))


@functools.lru_cache(maxsize=None)
def _coset_powers(k: int, shift: int, inverse: bool):
    n = 1 << k
    g = pow(shift, FR_MOD - 2, FR_MOD) if inverse else shift
    pws = []
    acc = 1
    for _ in range(n):
        pws.append(acc * _R % FR_MOD)
        acc = acc * g % FR_MOD
    return limb.ints_to_limbs(pws)


COSET_SHIFT = 5  # multiplicative generator of Fr*, not in the 2^k subgroup


def coeffs_to_coset_evals(coeffs, k: int, shift: int = COSET_SHIFT):
    """Evaluate a coefficient vector on the coset shift * <w>."""
    scaled = limb.mont_mul(FR, coeffs, jnp.asarray(_coset_powers(k, shift, False)))
    return ntt(scaled, k)


def coset_evals_to_coeffs(evals, k: int, shift: int = COSET_SHIFT):
    coeffs = intt(evals, k)
    return limb.mont_mul(FR, coeffs, jnp.asarray(_coset_powers(k, shift, True)))


def z_on_coset(k: int, shift: int = COSET_SHIFT) -> int:
    """Z(x) = x^n - 1 evaluated anywhere on the coset (constant g^n - 1)."""
    return (pow(shift, 1 << k, FR_MOD) - 1) % FR_MOD
