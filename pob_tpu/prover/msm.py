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


def pippenger_msm(ops, points, scalars, n_tiles: int = 64):
    """Variable-base MSM via window-vectorized Pippenger bucket accumulation.

    TPUs have no atomic scatter-add, so classic per-bucket accumulation is
    reformulated as (N_WINDOWS x T) independent sequential accumulators:
    the m points are split into T tiles, and ONE scan walks the tiles'
    slices in lockstep; at every step the T active points are scattered
    into all 32 windows' bucket rows at once (vector width 32T lanes, a
    unique-index dense dynamic-update scatter). Points stream through HBM
    exactly once. After the scan: a log2(T) masked fold merges the private
    rows per window, a 255-step reverse running sum forms each window's
    weighted bucket total (32 windows in parallel), and a 32-step Horner
    pass with 8 doublings combines the windows. Total point-adds ~= 32 m +
    O(T log T + 256), versus 512 m for double-and-add (msm above), with
    every op a static-shape vector op and a single compiled scan body per
    phase (compile-time flat in m, T).

    points: Jacobian arrays with leading axis m; scalars: (m, 16) canonical
    limbs. Returns a single Jacobian point."""
    m = int(points[0].shape[0])
    T = min(n_tiles, max(1, m))
    T = 1 << max(0, (T - 1).bit_length())  # power of two for the fold
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
    lane_w = jnp.arange(N_WINDOWS)[:, None]  # (32, 1)
    lane_t = jnp.arange(T)[None, :]  # (1, T)

    buckets = curve.infinity(ops, (N_WINDOWS, T, 256))

    def step(bk, x):
        p, d = x  # p: (T, coords), d: (T, 32)
        dw = d.T  # (32, T): bucket index per (window, tile) lane
        cur = tuple(c[lane_w, lane_t, dw] for c in bk)  # (32, T, coords)
        pb = tuple(jnp.broadcast_to(c, (N_WINDOWS,) + c.shape) for c in p)
        new = curve.point_add(ops, cur, pb)
        return tuple(c.at[lane_w, lane_t, dw].set(n) for c, n in zip(bk, new)), None

    buckets, _ = jax.lax.scan(step, buckets, (pts, digs))

    return _combine_buckets(ops, buckets, T)


def pippenger_msm_dense(ops, points, scalars, n_tiles: int = 8):
    """Pippenger with DENSE one-hot bucket updates — the TPU-native variant.

    XLA:TPU serializes scatter/gather at ~1-2us per index, which makes the
    classic bucket accumulation (pippenger_msm above) latency-bound at
    ~32*m us per MSM wall-clock regardless of tile count — and launches
    whose scatter count exceeds the device's watchdog window kill the TPU
    worker outright (r05 probe_msm bisection). Here the bucket read is a
    masked full-width reduction over the 256-bucket axis and the write a
    masked select over the whole bucket tensor: 256x more elements touched
    per step, but every op is a dense static-shape vector op the VPU
    streams. HBM traffic is tile-count-invariant (~2 * 32 windows * 256
    buckets * point bytes * m / T * T = ~0.8 TB at m=2^18, ~1 s at v5e
    bandwidth) and there is no serialized-scatter worker-kill risk.

    Same contract and bucket layout as pippenger_msm; the merge/weighted-
    sum/Horner phases are shared (_combine_buckets)."""
    m = int(points[0].shape[0])
    T = min(n_tiles, max(1, m))
    T = 1 << max(0, (T - 1).bit_length())
    t = -(-m // T)
    pad = T * t - m
    digits = scalar_digits(scalars)  # (m, 32)
    if pad:
        inf = curve.infinity(ops, (pad,))
        points = tuple(jnp.concatenate([c, i], axis=0) for c, i in zip(points, inf))
        # digit 256 is out of one-hot range: padded points touch no bucket
        digits = jnp.concatenate(
            [digits, jnp.full((pad, N_WINDOWS), 256, digits.dtype)], 0
        )
    pts = tuple(jnp.moveaxis(c.reshape((T, t) + c.shape[1:]), 1, 0) for c in points)
    digs = jnp.moveaxis(digits.reshape(T, t, N_WINDOWS), 1, 0)  # (t, T, 32)
    iota = jnp.arange(256, dtype=digits.dtype)

    buckets = curve.infinity(ops, (N_WINDOWS, T, 256))

    def step(bk, x):
        p, d = x  # p: (T, coords), d: (T, 32)
        oh = d.T[:, :, None] == iota  # (32, T, 256) one-hot over buckets
        ohc = oh.reshape(oh.shape + (1,) * (bk[0].ndim - 3))
        cur = tuple(
            jnp.where(ohc, c, 0).sum(axis=2, dtype=c.dtype) for c in bk
        )  # (32, T, coords): the addressed bucket per (window, tile) lane
        pb = tuple(jnp.broadcast_to(c, (N_WINDOWS,) + c.shape) for c in p)
        new = curve.point_add(ops, cur, pb)
        return (
            tuple(
                jnp.where(ohc, n[:, :, None], c) for c, n in zip(bk, new)
            ),
            None,
        )

    buckets, _ = jax.lax.scan(step, buckets, (pts, digs))

    return _combine_buckets(ops, buckets, T)


def _combine_buckets(ops, buckets, T: int):
    """Shared Pippenger tail: merge T private rows per window, weighted
    bucket sums, Horner window fold. buckets: (32, T, 256) Jacobian."""
    # merge the T private rows per window with a T-step accumulation scan at
    # (32, 256) width: T x 8192 point-adds is negligible next to the 32m main
    # scan, and the narrow body keeps the mont_mul widening intermediates
    # (~12KB per lane) inside the HBM budget — a full-width tree fold over
    # the (32, T, 256) tensor materialized multi-GB temps.
    if T > 1:
        rows_xs = tuple(jnp.moveaxis(c, 1, 0) for c in buckets)  # (T, 32, 256)

        def merge(acc, row):
            return curve.point_add(ops, acc, row), None

        bk, _ = jax.lax.scan(merge, curve.infinity(ops, (N_WINDOWS, 256)), rows_xs)
    else:
        bk = tuple(c[:, 0] for c in buckets)  # (32, 256) buckets

    # weighted sum_j j * bucket_j via reverse running sums, all windows at once
    acc0 = curve.infinity(ops, (N_WINDOWS,))

    def wstep(carry, x):
        run, tot = carry
        run = curve.point_add(ops, run, x)
        tot = curve.point_add(ops, tot, run)
        return (run, tot), None

    rev = tuple(jnp.moveaxis(jnp.flip(c[:, 1:], 1), 1, 0) for c in bk)  # (255, 32)
    (_, totals), _ = jax.lax.scan(wstep, (acc0, acc0), rev)

    # Horner over windows, high -> low: acc = 256*acc + window_total
    def horner(acc, w_total):
        for _ in range(WINDOW_BITS):
            acc = curve.point_double(ops, acc)
        return curve.point_add(ops, acc, w_total), None

    per_window = tuple(jnp.flip(c, 0) for c in totals)  # high window first
    acc, _ = jax.lax.scan(horner, curve.infinity(ops, ()), per_window)
    return acc


def pippenger_msm_g1(points, scalars, n_tiles: int = 64):
    return pippenger_msm(curve.FqOps, points, scalars, n_tiles)


def pippenger_msm_g2(points, scalars, n_tiles: int = 64):
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
