"""Byte/array plumbing gadgets (reference circuits/utils/{array,selector,
shift,concat,convert,divide}.circom), vectorized over leading batch axes.

Conventions:
- byte arrays: int32, trailing axis = position;
- small scalars (lengths, counts): int32, non-negative;
- big scalars (balances, keys): 16x16-bit uint32 limbs (pob_tpu.field.limb);
- every gadget that can reject in-circuit returns an `ok` bool alongside data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limb

I32 = jnp.int32


# ---------------------------------------------------------------------------
# masks / filters / selection
# ---------------------------------------------------------------------------


def filter_mask(count, n: int):
    """Filter (array.circom:26-40): first `count` positions 1, rest 0."""
    idx = jnp.arange(n, dtype=I32)
    return (idx < jnp.asarray(count, I32)[..., None]).astype(I32)


def fit(a, n: int):
    """Fit (array.circom:47-57): truncate or zero-pad the trailing axis to n."""
    m = a.shape[-1]
    if m >= n:
        return a[..., :n]
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n - m)]
    return jnp.pad(a, pad)


def reverse(a):
    return jnp.flip(a, axis=-1)


def selector(vals, select):
    """Selector (selector.circom:21-46): vals[select]; ok iff 0<=select<n."""
    n = vals.shape[-1]
    select = jnp.asarray(select, I32)
    ok = (select >= 0) & (select < n)
    oh = (jnp.arange(n, dtype=I32) == select[..., None]).astype(vals.dtype)
    return jnp.sum(vals * oh, axis=-1), ok


def selector_array(arrays, select):
    """SelectorArray1D (selector.circom:62-77): arrays (..., n, p) -> (..., p)."""
    n = arrays.shape[-2]
    select = jnp.asarray(select, I32)
    ok = (select >= 0) & (select < n)
    oh = (jnp.arange(n, dtype=I32) == select[..., None]).astype(arrays.dtype)
    return jnp.sum(arrays * oh[..., None], axis=-2), ok


def mask(a, count):
    """Mask (concat.circom:18-30): keep the first `count` entries."""
    return a * filter_mask(count, a.shape[-1])


def shift_left(a, count):
    """ShiftLeft (shift.circom:17-36): out[i] = a[i+count], zero fill.
    ok iff 0 <= count <= n."""
    n = a.shape[-1]
    count = jnp.asarray(count, I32)
    ok = (count >= 0) & (count <= n)
    idx = jnp.arange(n, dtype=I32) + count[..., None]
    valid = idx < n
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape[:-1], count.shape) + (n,)),
        jnp.clip(idx, 0, n - 1),
        axis=-1,
    )
    return gathered * valid.astype(a.dtype), ok


def shift_right(a, count, max_shift: int):
    """ShiftRight (shift.circom:51-76): widen to n+max_shift, out[i]=a[i-count].
    ok iff 0 <= count <= max_shift."""
    n = a.shape[-1]
    count = jnp.asarray(count, I32)
    ok = (count >= 0) & (count <= max_shift)
    idx = jnp.arange(n + max_shift, dtype=I32) - count[..., None]
    valid = (idx >= 0) & (idx < n)
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(
            a, jnp.broadcast_shapes(a.shape[:-1], count.shape) + (n,)
        ),
        jnp.clip(idx, 0, n - 1),
        axis=-1,
    )
    return gathered * valid.astype(a.dtype), ok


def concat(a, a_len, b, b_len):
    """Concat (concat.circom:47-84). Returns (out, out_len, ok)."""
    max_a = a.shape[-1]
    max_b = b.shape[-1]
    a_len = jnp.asarray(a_len, I32)
    b_len = jnp.asarray(b_len, I32)
    ok = (a_len >= 0) & (a_len <= max_a) & (b_len >= 0) & (b_len <= max_b)
    masked_a = fit(mask(a, a_len), max_a + max_b)
    masked_b = mask(b, b_len)
    shifted_b, ok2 = shift_right(masked_b, a_len, max_a)
    return masked_a + shifted_b, a_len + b_len, ok & ok2


# ---------------------------------------------------------------------------
# numeric conversions
# ---------------------------------------------------------------------------


def count_bytes(b):
    """CountBytes (rlp/integer.circom:16-49): significant bytes of BE array."""
    still_zero = jnp.cumprod((b == 0).astype(I32), axis=-1)
    return b.shape[-1] - jnp.sum(still_zero, axis=-1)


def bytes_to_nibbles(b):
    """Bytes2Nibbles (convert.circom:103-120): high nibble first."""
    hi = b >> 4
    lo = b & 0xF
    out = jnp.stack([hi, lo], axis=-1)
    return out.reshape(b.shape[:-1] + (2 * b.shape[-1],))


def nibbles_to_bytes(nib):
    """Nibbles2Bytes (convert.circom:132-142). ok iff all nibbles < 16."""
    ok = jnp.all((nib >= 0) & (nib < 16), axis=-1)
    pairs = nib.reshape(nib.shape[:-1] + (nib.shape[-1] // 2, 2))
    return pairs[..., 0] * 16 + pairs[..., 1], ok


def limbs_to_be_bytes_checked(v, n: int):
    """Num2BigEndianBytes(n) on a limb scalar: returns (bytes (..., n), ok)
    where ok iff v < 2^(8n) (the implicit Num2Bits range check,
    convert.circom:46-96)."""
    be32 = limb.limbs_to_be_bytes(v)  # (..., 32)
    if n >= 32:
        out = fit(reverse(fit(reverse(be32), n)), n)  # left-pad with zeros
        return out, jnp.ones(v.shape[:-1], bool)
    ok = jnp.all(be32[..., : 32 - n] == 0, axis=-1)
    return be32[..., 32 - n :], ok


def be_bytes_to_limbs_any(b):
    """BigEndianBytes2Num for up to 32 bytes -> limb scalar."""
    n = b.shape[-1]
    assert n <= 32
    padded = jnp.zeros(b.shape[:-1] + (32,), I32).at[..., 32 - n :].set(b)
    return limb.be_bytes_to_limbs(padded)


def is_byte_string(b):
    """AssertByteString (assert.circom:26-31) as a flag."""
    return jnp.all((b >= 0) & (b < 256), axis=-1)


# ---------------------------------------------------------------------------
# comparisons (small ints and limb scalars)
# ---------------------------------------------------------------------------


def fits_bits_i32(v, bits: int):
    """AssertBits for an int32 scalar."""
    v = jnp.asarray(v, I32)
    if bits >= 31:
        return v >= 0
    return (v >= 0) & (v < (1 << bits))


def limb_lt(a, b):
    """a < b on limb scalars (lexicographic via borrow)."""
    _, borrow = limb._sub_raw(a, b)
    return borrow == 1


def limb_leq(a, b):
    return ~limb_lt(b, a)


def limb_fits_bits(v, bits: int):
    """v < 2^bits for a limb scalar (bits <= 256)."""
    if bits >= 256:
        return jnp.ones(v.shape[:-1], bool)
    full = bits // 16
    rem = bits % 16
    ok = jnp.all(v[..., full + (1 if rem else 0) :] == 0, axis=-1)
    if rem:
        ok = ok & (v[..., full] < (1 << rem))
    return ok


def limb_from_i32(x, shape_like=None):
    """Small non-negative int32 scalar -> limb scalar (for mixed compares)."""
    x = jnp.asarray(x, jnp.uint32)
    out = jnp.zeros(x.shape + (limb.L,), limb.U32)
    out = out.at[..., 0].set(x & 0xFFFF)
    out = out.at[..., 1].set(x >> 16)
    return out


def divide(a, b_static: int):
    """Divide (divide.circom:17-33) with a static divisor: floor div + rem."""
    a = jnp.asarray(a, I32)
    return a // b_static, a % b_static
