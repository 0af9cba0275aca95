"""Pallas TPU kernel for batched 256-bit Montgomery multiplication.

The XLA path (field/limb.py) expresses the 16x16-limb schoolbook convolution
as one int32 matmul against a 0/1 accumulation matrix plus fused elementwise
carry fixes. This module is the hand-written alternative the north star asks
us to evaluate ("every field-mul kernel at speed-of-light"): one Pallas
kernel holding the whole multiply–reduce in VMEM — limbs laid out along the
sublane axis, batch along the 128-wide lane axis, so every partial product is
a full-width VPU op and no intermediate ever round-trips HBM.

scripts/kernel_roofline.py benchmarks both; whichever wins on the real chip
is the design answer (documented in ROOFLINE.json / README).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limb

L = limb.L
MASK = limb.MASK


def _conv32(lo, hi):
    """Schoolbook convolution of 16x16 lo/hi partial products into 32 diagonal
    accumulators. lo/hi: (16, 16, lanes) int32, [i, j] = halves of a_i * b_j.
    Returns (32, lanes) int32 with each entry < 2^21 (sums of <= 32 < 2^16).

    Built with stack/concat only — `.at[...]` updates lower to scatter,
    which Mosaic (Pallas TPU) does not implement (r05: the interpret-mode
    CPU tests passed while the real-TPU lowering raised NotImplementedError).
    """
    lanes = lo.shape[-1]
    rows = []
    for d in range(2 * L - 1):
        terms = []
        for i in range(max(0, d - L + 1), min(L, d + 1)):
            terms.append(lo[i, d - i])
        if d >= 1:
            for i in range(max(0, d - L), min(L, d)):
                terms.append(hi[i, d - 1 - i])
        rows.append(sum(terms) if terms else jnp.zeros((lanes,), jnp.int32))
    # hi half of the top diagonal lands in limb 31
    rows.append(hi[L - 1, L - 1])
    return jnp.stack(rows)


def _shift_rows(x, d):
    """x rolled down by d rows with zero fill (scatter-free: Mosaic has no
    scatter lowering, so `.at[d:].set` is off-limits in-kernel)."""
    pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _carry16(acc, n):
    """Normalize (n, lanes) accumulators to 16-bit limbs (mod 2^(16n))."""
    v = acc.astype(jnp.uint32)
    for _ in range(2):
        carry = v >> 16
        v = (v & MASK) + _shift_rows(carry, 1)
    # remaining carries are 0/1: ripple via log-steps of (generate, propagate)
    g = v >> 16
    p = (v == MASK).astype(jnp.uint32)
    d = 1
    while d < n:
        g = g | (p & _shift_rows(g, d))
        p = p & _shift_rows(p, d)
        d *= 2
    cin = _shift_rows(g, 1)
    return ((v & MASK) + cin) & MASK


def _mul_wide_cols(a, b):
    """a, b: (16, lanes) u32 -> (32, lanes) normalized 16-bit limbs."""
    prod = a[:, None, :] * b[None, :, :]  # (16, 16, lanes), exact in u32
    lo = (prod & MASK).astype(jnp.int32)
    hi = (prod >> 16).astype(jnp.int32)
    return _carry16(_conv32(lo, hi), 2 * L)


def _mont_kernel_body(spec_p, spec_np, a_ref, o_ref):
    ab = a_ref[...]  # (2, 16, lanes)
    a, b = ab[0], ab[1]
    c = _mul_wide_cols(a, b)
    m = _mul_wide_cols(c[:L], spec_np)[:L]
    mp = _mul_wide_cols(m, spec_p)
    u = (c + mp).astype(jnp.int32)
    fixed = _carry16(jnp.concatenate([u, jnp.zeros((1,) + u.shape[1:], jnp.int32)]), 2 * L + 1)
    hi = fixed[L : 2 * L]
    carry = fixed[2 * L]
    # conditional subtract p: r = hi - p if (carry or hi >= p)
    comp = MASK - spec_p
    v = hi + comp
    v = jnp.concatenate([v[:1] + 1, v[1:]], axis=0)
    sub = _carry16(jnp.concatenate([v, jnp.zeros((1,) + v.shape[1:], jnp.uint32)]), L + 1)
    no_borrow = sub[L]  # 1 iff hi >= p
    take = (carry | no_borrow).astype(bool)
    o_ref[...] = jnp.where(take[None, :], sub[:L], hi).astype(jnp.uint32)


@functools.lru_cache(maxsize=None)
def _mont_mul_pallas_fn(mod: int, lanes: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = limb.FieldSpec.make(mod)
    p_host = np.broadcast_to(spec.p[:, None], (L, lanes)).copy()
    np_host = np.broadcast_to(spec.np_full[:, None], (L, lanes)).copy()

    def kernel(consts_ref, a_ref, o_ref):
        consts = consts_ref[...]
        _mont_kernel_body(consts[0], consts[1], a_ref, o_ref)

    interpret = jax.default_backend() != "tpu"  # CPU tests: interpreter mode

    consts = jnp.asarray(np.stack([p_host, np_host]).astype(np.uint32))

    @jax.jit
    def run(ab):  # (2, 16, n) with n % lanes == 0
        n = ab.shape[-1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(n // lanes,),
            in_specs=[
                pl.BlockSpec((2, L, lanes), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, L, lanes), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, lanes), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(consts, ab)

    return run


def mont_mul_pallas(spec, a, b, lanes: int = 512):
    """Drop-in twin of limb.mont_mul for (m, 16) operands via the Pallas
    kernel (m padded to a lane multiple)."""
    m = a.shape[0]
    mp = -(-m // lanes) * lanes
    at = jnp.zeros((L, mp), jnp.uint32).at[:, :m].set(a.T)
    bt = jnp.zeros((L, mp), jnp.uint32).at[:, :m].set(b.T)
    out = _mont_mul_pallas_fn(spec.mod, lanes)(jnp.stack([at, bt]))
    return out[:, :m].T
