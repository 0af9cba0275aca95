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


def pippenger_msm(ops, points, scalars, n_tiles: int = 4096):
    """Variable-base MSM via tile-parallel Pippenger bucket accumulation.

    TPUs have no atomic scatter-add, so classic per-bucket accumulation is
    reformulated as T independent sequential accumulators: the m points are
    split into T tiles; a scan walks each tile's slice in lockstep, and at
    every step the T active points are gathered-from / scattered-to each
    tile's private (256,) bucket row at its own digit — a unique-index
    scatter, which XLA handles as a dense dynamic-update. Total point-adds:
    32 windows x (m/T scan steps x T lanes + log T merge + 2*256 weighted
    reduction) ~= 32 m, versus 512 m for double-and-add (msm above), with
    every op a wide static-shape vector op.

    points: Jacobian arrays with leading axis m; scalars: (m, 16) canonical
    limbs. Returns a single Jacobian point."""
    m = int(points[0].shape[0])
    T = min(n_tiles, max(1, m))
    t = -(-m // T)  # ceil: scan length per tile
    pad = T * t - m
    digits = scalar_digits(scalars)  # (m, 32)
    if pad:
        inf = curve.infinity(ops, (pad,))
        points = tuple(jnp.concatenate([c, i], axis=0) for c, i in zip(points, inf))
        digits = jnp.concatenate([digits, jnp.zeros((pad, N_WINDOWS), digits.dtype)], 0)
    # tile-major layout: tile j owns points [j*t, (j+1)*t); scan axis first
    pts = tuple(jnp.moveaxis(c.reshape((T, t) + c.shape[1:]), 1, 0) for c in points)
    digs = jnp.moveaxis(digits.reshape(T, t, N_WINDOWS), 1, 0)  # (t, T, 32)
    lane = jnp.arange(T)

    def window_sum(dw):
        """dw: (t, T) digits of one window -> window bucket-weighted sum."""
        buckets = curve.infinity(ops, (T, 256))

        def step(bk, x):
            p, d = x
            cur = tuple(c[lane, d] for c in bk)
            new = curve.point_add(ops, cur, p)
            return tuple(c.at[lane, d].set(n) for c, n in zip(bk, new)), None

        buckets, _ = jax.lax.scan(step, buckets, (pts, dw))
        # merge the T private bucket rows -> (256,) buckets (log T tree)
        n = T
        bk = buckets
        while n > 1:
            half = n // 2
            lo = tuple(c[:half] for c in bk)
            hi = tuple(c[half : 2 * half] for c in bk)
            s = curve.point_add(ops, lo, hi)
            if n % 2:
                bk = tuple(jnp.concatenate([cs, c[2 * half :]], 0) for cs, c in zip(s, bk))
                n = half + 1
            else:
                bk, n = s, half
        bk = tuple(c[0] for c in bk)  # (256,) buckets
        # weighted sum_j j * bucket_j via reverse running sums
        acc0 = curve.infinity(ops, ())

        def wstep(carry, x):
            run, tot = carry
            run = curve.point_add(ops, run, x)
            tot = curve.point_add(ops, tot, run)
            return (run, tot), None

        rev = tuple(jnp.flip(c[1:], 0) for c in bk)  # j = 255 .. 1
        (_, total), _ = jax.lax.scan(wstep, (acc0, acc0), rev)
        return total

    def win_body(acc, dw):  # windows scanned high -> low
        for _ in range(WINDOW_BITS):
            acc = curve.point_double(ops, acc)
        return curve.point_add(ops, acc, window_sum(dw)), None

    per_window = jnp.flip(jnp.moveaxis(digs, 2, 0), 0)  # (32, t, T), high first
    acc, _ = jax.lax.scan(win_body, curve.infinity(ops, ()), per_window)
    return acc


def pippenger_msm_g1(points, scalars, n_tiles: int = 4096):
    return pippenger_msm(curve.FqOps, points, scalars, n_tiles)


def pippenger_msm_g2(points, scalars, n_tiles: int = 4096):
    return pippenger_msm(curve.Fq2Ops, points, scalars, n_tiles)


def windowed_fixed_base_msm(ops, table, scalars):
    """Windowed fixed-base scalar multiplication: one gather + one point add
    per 8-bit window (32 adds per scalar instead of 256), expressed as a scan
    over windows so the compiled graph holds a single point-add.

    table: Jacobian arrays with leading axes (N_WINDOWS, 256) where
    table[w, v] = v * 2^(8w) * G (v=0 entries are infinity).
    scalars: (m, 16) canonical limbs. Returns (m,) Jacobian points."""
    digits = scalar_digits(scalars)  # (m, 32)
    m = digits.shape[0]
    acc0 = curve.infinity(ops, (m,))

    def body(acc, x):
        tab_w, d = x  # tab_w: (256,) points of this window; d: (m,) digits
        pts = tuple(jnp.take(c, d, axis=0) for c in tab_w)
        return curve.point_add(ops, acc, pts), None

    acc, _ = jax.lax.scan(body, acc0, (table, jnp.moveaxis(digits, 1, 0)))
    return acc
