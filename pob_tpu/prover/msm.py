"""Multi-scalar multiplication on device.

v1 strategy (scatter-free, fully vectorized — TPUs dislike the random bucket
scatter of classic Pippenger): a 256-step double-and-add scan where each step
does one batched conditional add and one batched doubling across all m lanes,
followed by a log-depth add tree. Work is O(256 m) point-ops but every op is a
dense static-shape vector op, which is what the VPU wants; bucket-sorted
Pippenger is the planned round-2 upgrade.

Also provides fixed-base MSM (shared base-power table, one conditional add per
bit) used by the Groth16 trusted setup."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import limb
from . import curve


def scalar_bits(scalars):
    """(m, 16) canonical Fr limbs -> (256, m) bool bits, LSB first."""
    bits = limb.limbs_to_bits_le(scalars, 256)  # (m, 256)
    return jnp.moveaxis(bits.astype(bool), -1, 0)


def msm(ops, points, scalars):
    """points: Jacobian (X, Y, Z) with leading axis m; scalars: (m, 16)
    canonical limbs. Returns a single Jacobian point (batch-free)."""
    bits = scalar_bits(scalars)  # (256, m)
    m = bits.shape[1]
    # derive the init accumulator from `points` (a select against the inputs)
    # so its abstract type matches inside shard_map (varying-over-mesh-axis)
    acc0 = curve.point_select(
        ops, jnp.zeros((m,), bool), points, curve.infinity(ops, (m,))
    )

    def body(carry, bit):
        acc, base = carry
        added = curve.point_add(ops, acc, base)
        acc = curve.point_select(ops, bit, added, acc)
        base = curve.point_double(ops, base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (acc0, points), bits)
    return curve.tree_reduce(ops, acc)


def msm_g1(points, scalars):
    return msm(curve.FqOps, points, scalars)


def msm_g2(points, scalars):
    return msm(curve.Fq2Ops, points, scalars)


def fixed_base_msm(ops, table, bits):
    """table: Jacobian point arrays with leading axis 256 (2^b * G);
    bits: (256, m) bool. Returns (m,) Jacobian points = scalar_i * G."""
    m = bits.shape[1]
    acc0 = curve.infinity(ops, (m,))

    def body(acc, x):
        bit, tx, ty, tz = x
        base = (
            jnp.broadcast_to(tx, (m,) + tx.shape),
            jnp.broadcast_to(ty, (m,) + ty.shape),
            jnp.broadcast_to(tz, (m,) + tz.shape),
        )
        added = curve.point_add(ops, acc, base)
        return curve.point_select(ops, bit, added, acc), None

    acc, _ = jax.lax.scan(body, acc0, (bits,) + table)
    return acc


WINDOW_BITS = 8
N_WINDOWS = 256 // WINDOW_BITS


def scalar_digits(scalars):
    """(m, 16) canonical limbs -> (m, 32) uint8-range window digits (base 256).

    With 16-bit limbs each limb yields two base-256 digits."""
    lo = (scalars & 0xFF).astype(jnp.int32)
    hi = ((scalars >> 8) & 0xFF).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(scalars.shape[:-1] + (N_WINDOWS,))


def windowed_fixed_base_msm(ops, table, scalars):
    """Windowed fixed-base scalar multiplication: one gather + one point add
    per 8-bit window (32 adds per scalar instead of 256).

    table: Jacobian arrays with leading axes (N_WINDOWS, 256) where
    table[w, v] = v * 2^(8w) * G (v=0 entries are infinity).
    scalars: (m, 16) canonical limbs. Returns (m,) Jacobian points."""
    digits = scalar_digits(scalars)  # (m, 32)
    m = digits.shape[0]
    acc = curve.infinity(ops, (m,))
    for w in range(N_WINDOWS):
        pts = tuple(jnp.take(c[w], digits[:, w], axis=0) for c in table)
        acc = curve.point_add(ops, acc, pts)
    return acc
