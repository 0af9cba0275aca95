"""Batched big-integer modular arithmetic for TPU, in JAX.

Representation: a field element is a little-endian vector of 16 limbs x 16
bits stored in ``uint32`` (trailing axis of size 16). All ops broadcast over
arbitrary leading (batch) axes and are jittable; hot paths run in Montgomery
form (R = 2^256).

Why 16-bit limbs in uint32: the TPU VPU has no 64-bit multiplier. 16x16-bit
limb products fit exactly in uint32 ((2^16-1)^2 < 2^32), and partial products
split into lo/hi halves accumulate across 16 limbs while staying < 2^22 —
no overflow, no data-dependent control flow, everything static-shape so XLA
fuses the whole multiply chain. (Replaces the x86 fr.asm witness-runtime
role of the reference: circuits/main_*_cpp, Makefile:5-6.)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .ref import FR_MOD, FQ_MOD

L = 16  # limbs per element
BITS = 16  # bits per limb
MASK = 0xFFFF
U32 = jnp.uint32


def int_to_limbs(x: int, n: int = L) -> np.ndarray:
    """Python int -> little-endian uint32 limb vector."""
    return np.array([(x >> (BITS * i)) & MASK for i in range(n)], dtype=np.uint32)


def ints_to_limbs(xs, n: int = L) -> np.ndarray:
    """Iterable of ints -> (len, n) uint32 limb array.

    Vectorized through a byte buffer (one C-level to_bytes per element) so
    million-element conversions (Groth16 setup) stay fast."""
    xs = list(xs)
    if not xs:
        return np.zeros((0, n), np.uint32)
    buf = b"".join(int(x).to_bytes(2 * n, "little") for x in xs)
    return np.frombuffer(buf, np.uint16).reshape(len(xs), n).astype(np.uint32)


def limbs_to_int(a) -> int:
    """Single limb vector (host) -> python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (BITS * i) for i, v in enumerate(a))


def limbs_to_ints(a):
    """(batch..., n) limb array -> nested lists of python ints."""
    a = np.asarray(a)
    if a.ndim == 1:
        return limbs_to_int(a)
    return [limbs_to_ints(x) for x in a]


def limb_rows_to_ints(a) -> list:
    """(m, n) limb array -> list of m python ints.

    One C-level int.from_bytes per row instead of limbs_to_int's n python
    shifts: on the 3.96M-wire PoB witness this is the difference between
    minutes and ~2 s of host conversion (cli.py cmd_witness)."""
    a = np.ascontiguousarray(np.asarray(a, dtype=np.uint32)).astype("<u2")
    buf = a.tobytes()
    n2 = a.shape[1] * 2
    return [int.from_bytes(buf[i * n2:(i + 1) * n2], "little")
            for i in range(a.shape[0])]


@dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static per-modulus constants (embedded into jitted programs)."""

    mod: int
    p: np.ndarray  # (L,) limbs of modulus
    np_full: np.ndarray  # (L,) limbs of -p^{-1} mod 2^256 (full-word REDC)
    r_mont: np.ndarray  # R mod p = Montgomery representation of 1
    r2: np.ndarray  # R^2 mod p (for to_mont)
    inv_exp_bits: np.ndarray  # bits of mod-2, MSB first (for inversion)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(mod: int) -> "FieldSpec":
        r = (1 << (L * BITS)) % mod
        r2 = (r * r) % mod
        np_full = (-pow(mod, -1, 1 << (L * BITS))) % (1 << (L * BITS))
        e = mod - 2
        bits = np.array([(e >> i) & 1 for i in range(e.bit_length())][::-1], dtype=bool)
        return FieldSpec(
            mod=mod,
            p=int_to_limbs(mod),
            np_full=int_to_limbs(np_full),
            r_mont=int_to_limbs(r),
            r2=int_to_limbs(r2),
            inv_exp_bits=bits,
        )


FR = FieldSpec.make(FR_MOD)
FQ = FieldSpec.make(FQ_MOD)


# ---------------------------------------------------------------------------
# carry / borrow plumbing
#
# Carry propagation is the serial bottleneck of limbed arithmetic; instead of
# an O(n) ripple chain (terrible for both XLA graph size and VPU utilization)
# we use two vectorized split-add passes (after which every pending carry is
# 0 or 1) and resolve the remaining unit-carry ripple with a Kogge-Stone
# parallel prefix in log2(n) steps — all static-shape vector ops.
# ---------------------------------------------------------------------------


def _shift_up(a, d: int = 1):
    """Shift limb values toward higher indices by d, zero-filling."""
    pad = [(0, 0)] * (a.ndim - 1) + [(d, 0)]
    return jnp.pad(a, pad)[..., : a.shape[-1]]


def carry_fix(v):
    """Normalize arbitrary uint32 limb accumulators to 16-bit limbs.

    Arithmetic is mod 2^(16n) — the caller provides headroom limbs if the
    carry out of the top limb matters."""
    n = v.shape[-1]
    # pass 1: carries up to 16 bits
    v = (v & MASK) + _shift_up(v >> BITS)  # now < 2^17
    # pass 2: carries are 0/1
    v = (v & MASK) + _shift_up(v >> BITS)  # now <= 2^16
    # unit-carry ripple via parallel prefix over (generate, propagate)
    g = v >> BITS  # 0/1
    p = (v == MASK).astype(U32)
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    cin = _shift_up(g)
    return ((v & MASK) + cin) & MASK


def _carry_prop(c):
    """Back-compat helper: normalize and also return the carry past the top.

    Appends a headroom limb, runs carry_fix, splits it back off."""
    pad = [(0, 0)] * (c.ndim - 1) + [(0, 1)]
    fixed = carry_fix(jnp.pad(c, pad))
    return fixed[..., :-1], fixed[..., -1]


def _sub_raw(a, b):
    """16-limb subtraction a - b; returns (limbs, borrow in {0,1}).

    Implemented as a + complement(b) + 1 so it reuses the parallel carry fix."""
    comp = MASK - b
    v = a + comp
    v = v.at[..., 0].add(1)
    pad = [(0, 0)] * (v.ndim - 1) + [(0, 1)]
    fixed = carry_fix(jnp.pad(v, pad))
    carry_out = fixed[..., L]
    return fixed[..., :L], 1 - carry_out


def _cond_sub_p(spec: FieldSpec, s, carry):
    """Given s (16 limbs) + carry bit representing a value < 2p, reduce mod p."""
    p = jnp.asarray(spec.p)
    d, borrow = _sub_raw(s, jnp.broadcast_to(p, s.shape))
    take_d = jnp.logical_or(carry.astype(bool), borrow == 0)
    return jnp.where(take_d[..., None], d, s)


# ---------------------------------------------------------------------------
# modular add / sub / neg
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a, b):
    s, carry = _carry_prop(a + b)
    return _cond_sub_p(spec, s, carry)


def sub(spec: FieldSpec, a, b):
    d, borrow = _sub_raw(a, b)
    p = jnp.broadcast_to(jnp.asarray(spec.p), d.shape)
    fixed, _ = _carry_prop(d + p)
    return jnp.where((borrow == 1)[..., None], fixed, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """Elementwise field select: cond broadcast over the limb axis."""
    return jnp.where(cond[..., None], a, b)


# ---------------------------------------------------------------------------
# multiplication / Montgomery reduction
# ---------------------------------------------------------------------------


# (i, j) partial product -> diagonal accumulator mapping for the schoolbook
# multiply, expressed as one 0/1 matrix so the whole convolution becomes a
# single int32 matmul (MXU-friendly on TPU, one HLO op instead of 32 scatter
# updates): [plo_flat | phi_flat] (..., 512) @ _CONV (512, 32) -> (..., 32).
def _conv_matrix():
    m = np.zeros((2 * L * L, 2 * L), np.int32)
    for i in range(L):
        for j in range(L):
            m[i * L + j, i + j] = 1  # lo half of a_i * b_j
            m[L * L + i * L + j, i + j + 1] = 1  # hi half
    return m


_CONV = _conv_matrix()


def mul_wide(a, b):
    """Full 512-bit product of two 16-limb values -> 32 normalized limbs."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (L,))
    b = jnp.broadcast_to(b, shape + (L,))
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16), exact in uint32
    lo = (prod & MASK).astype(jnp.int32)
    hi = (prod >> BITS).astype(jnp.int32)
    flat = jnp.concatenate(
        [lo.reshape(shape + (L * L,)), hi.reshape(shape + (L * L,))], axis=-1
    )
    acc = jax.lax.dot_general(
        flat,
        jnp.asarray(_CONV),
        (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(U32)  # sums of <= 32 terms < 2^16 each: < 2^21, exact in int32
    return carry_fix(acc)  # product < 2^512: top carry is zero


def mont_reduce(spec: FieldSpec, c):
    """Full-word Montgomery REDC: 32 normalized limbs -> (c * R^{-1}) mod p.

    m = (c mod R) * (-p^{-1} mod R) mod R; result = (c + m*p) / R, one
    conditional subtraction. Three wide multiplies total, each a single
    matmul."""
    m = mul_wide(c[..., :L], jnp.asarray(spec.np_full))[..., :L]
    mp = mul_wide(m, jnp.asarray(spec.p))
    u = c + mp  # < 2^17 per limb
    pad = [(0, 0)] * (u.ndim - 1) + [(0, 1)]
    fixed = carry_fix(jnp.pad(u, pad))  # (..., 33); low 16 limbs are zero
    hi_limbs = fixed[..., L : 2 * L]
    carry = fixed[..., 2 * L]  # result < 2p: carry is 0/1
    return _cond_sub_p(spec, hi_limbs, carry)


def mont_mul(spec: FieldSpec, a, b):
    return mont_reduce(spec, mul_wide(a, b))


def mont_sqr(spec: FieldSpec, a):
    return mont_reduce(spec, mul_wide(a, a))


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.r2))

def from_mont(spec: FieldSpec, a):
    c = jnp.zeros(a.shape[:-1] + (2 * L,), U32).at[..., :L].set(a)
    return mont_reduce(spec, c)


def mont_pow_bits(spec: FieldSpec, a, exp_bits):
    """a^e for a in Montgomery form, e given as a static MSB-first bit array.

    Uses lax.scan so the compiled graph stays small (one squaring + one
    conditional multiply per step)."""
    bits = jnp.asarray(np.asarray(exp_bits, dtype=bool))
    one = jnp.broadcast_to(jnp.asarray(spec.r_mont), a.shape)

    def body(r, bit):
        r = mont_sqr(spec, r)
        rm = mont_mul(spec, r, a)
        return select(jnp.broadcast_to(bit, r.shape[:-1]), rm, r), None

    out, _ = jax.lax.scan(body, one, bits)
    return out


def mont_pow_int(spec: FieldSpec, a, e: int):
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())][::-1], dtype=bool)
    return mont_pow_bits(spec, a, bits)


def inv_mont(spec: FieldSpec, a):
    """Inverse in Montgomery form via Fermat (a^(p-2)); inv(aR)->a^{-1}R."""
    return mont_pow_bits(spec, a, spec.inv_exp_bits)


def batch_inv_mont(spec: FieldSpec, a, axis: int = 0):
    """Montgomery-trick batched inversion along `axis` (one field inversion
    total). Zero entries map to zero."""
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    one = jnp.asarray(spec.r_mont)
    zero_mask = is_zero(a)
    safe = select(zero_mask, jnp.broadcast_to(one, a.shape), a)

    prefixes = [jnp.broadcast_to(one, a.shape[1:])]
    for i in range(n):
        prefixes.append(mont_mul(spec, prefixes[-1], safe[i]))
    total_inv = inv_mont(spec, prefixes[-1])
    outs = [None] * n
    acc = total_inv
    for i in range(n - 1, -1, -1):
        outs[i] = mont_mul(spec, acc, prefixes[i])
        acc = mont_mul(spec, acc, safe[i])
    out = jnp.stack(outs, axis=0)
    out = select(zero_mask, jnp.zeros_like(out), out)
    return jnp.moveaxis(out, 0, axis)


def batch_inv_mont_scan(spec: FieldSpec, a):
    """Montgomery-trick batched inversion over a large leading axis, using
    log-depth associative scans (batch_inv_mont unrolls its loop in Python and
    is only suitable for small static batches). a: (n, 16) Montgomery, n >= 1.
    Zero entries map to zero. One field inversion total."""
    one = jnp.broadcast_to(jnp.asarray(spec.r_mont), a.shape)
    zero_mask = is_zero(a)
    safe = select(zero_mask, one, a)
    mul = lambda x, y: mont_mul(spec, x, y)
    # inclusive prefix products p[i] = a0*...*ai, and reversed suffix products
    prefix = jax.lax.associative_scan(mul, safe, axis=0)
    suffix = jnp.flip(jax.lax.associative_scan(mul, jnp.flip(safe, 0), axis=0), 0)
    total_inv = inv_mont(spec, prefix[-1])
    # inv[i] = total_inv * prefix_exclusive[i] * suffix_exclusive[i]
    pre_ex = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
    suf_ex = jnp.concatenate([suffix[1:], one[:1]], axis=0)
    out = mul(mul(pre_ex, suf_ex), jnp.broadcast_to(total_inv, a.shape))
    return select(zero_mask, jnp.zeros_like(out), out)


def mont_powers(spec: FieldSpec, base: int, n: int):
    """Device array (n, 16) of base^j in Montgomery form, j in [0, n), built
    by log-step doubling (j-th chunk = previous chunk * base^len)."""
    base_m = jnp.asarray(int_to_limbs(base % spec.mod * pow(2, 256, spec.mod) % spec.mod))
    return mont_powers_mont(spec, base_m, n)


def mont_powers_mont(spec: FieldSpec, base_mont, n: int):
    """Like mont_powers but with the base as a traced (16,) Montgomery operand
    (usable inside jit with a data-dependent base)."""
    assert n >= 1
    acc = jnp.asarray(spec.r_mont)[None, :]  # [base^0]
    step = base_mont
    while acc.shape[0] < n:
        acc = jnp.concatenate([acc, mont_mul(spec, acc, step)], axis=0)
        step = mont_sqr(spec, step)
    return acc[:n]


# ---------------------------------------------------------------------------
# byte / scalar conversions (device-side)
# ---------------------------------------------------------------------------


def limbs_to_be_bytes(a):
    """(..., 16) limbs -> (..., 32) big-endian bytes (int32)."""
    lo = (a & 0xFF).astype(jnp.int32)
    hi = ((a >> 8) & 0xFF).astype(jnp.int32)
    le = jnp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (2 * L,))
    return jnp.flip(le, axis=-1)


def be_bytes_to_limbs(b):
    """(..., 32) big-endian bytes -> (..., 16) limbs."""
    le = jnp.flip(b, axis=-1).astype(U32)
    pairs = le.reshape(b.shape[:-1] + (L, 2))
    return pairs[..., 0] | (pairs[..., 1] << 8)


def limbs_to_bits_le(a, nbits: int = 256):
    """(..., 16) limbs -> (..., nbits) little-endian bits (int32)."""
    shifts = np.arange(BITS, dtype=np.uint32)
    bits = (a[..., :, None] >> shifts) & 1
    bits = bits.reshape(a.shape[:-1] + (L * BITS,))
    return bits[..., :nbits].astype(jnp.int32)
