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
def _root_powers(k: int, inverse: bool):
    """w^t * R for t in [0, 2^(k-1)): the master twiddle table every stage
    gathers from (stage s uses strided indices (j % 2^s) * 2^(k-1-s))."""
    n = 1 << k
    w = domain_root(k)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    tw = []
    acc = 1
    for _ in range(max(1, n // 2)):
        tw.append(acc * _R % FR_MOD)
        acc = acc * w % FR_MOD
    return limb.ints_to_limbs(tw)  # (n/2, 16)


@functools.lru_cache(maxsize=None)
def _bitrev(k: int):
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{k}b")[::-1], 2) if k else 0
    return rev


def _transform(a, k: int, inverse: bool):
    """Iterative Cooley-Tukey as ONE lax.scan over the k butterfly stages —
    per-stage gather indices are computed inside the body from the stage's
    half-size scalar, so the traced program holds a single butterfly body
    regardless of k. This keeps the prover's compile-time (6 transforms per
    proof) flat; the unrolled form put 18 x 6 distinct stage graphs in the
    module and made XLA lowering the bottleneck."""
    import jax

    n = 1 << k
    if k == 0:
        return a
    a = jnp.take(a, jnp.asarray(_bitrev(k)), axis=-2)
    roots = jnp.asarray(_root_powers(k, inverse))  # (n/2, 16)
    j = jnp.arange(n // 2)
    i_out = jnp.arange(n)
    halves = jnp.asarray([1 << s for s in range(k)], jnp.int32)

    def stage(x, half):
        # butterfly pairs: u at (j//half)*2half + j%half, v = u + half
        jm = j % half
        u_idx = (j // half) * (2 * half) + jm
        v_idx = u_idx + half
        tw = roots[jm * (n // 2 // half)]  # (n/2, 16)
        u = jnp.take(x, u_idx, axis=-2)
        v = limb.mont_mul(FR, jnp.take(x, v_idx, axis=-2), tw)
        w = jnp.concatenate([limb.add(FR, u, v), limb.sub(FR, u, v)], axis=-2)
        # output i reads w[src]: top half of w holds u+v entries, bottom u-v
        in_hi = (i_out // half) % 2
        src = (i_out // (2 * half)) * half + i_out % half + in_hi * (n // 2)
        return jnp.take(w, src, axis=-2), None

    out, _ = jax.lax.scan(stage, a, halves)
    return out


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
