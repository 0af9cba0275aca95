"""Batched BN254 curve arithmetic on device: Jacobian G1 (over Fq) and G2
(over Fq2), generic over the coordinate field so both share one set of
branchless add/double formulas (complete via select, never data-dependent
control flow — the XLA-native analog of constant-time curve code).

Points: tuple (X, Y, Z) of coordinate elements in Montgomery form; the point
at infinity is encoded as Z == 0."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FQ
from ..field.ref import FQ_MOD

_R = (1 << 256) % FQ_MOD


class FqOps:
    """Coordinate ops for Fq: element shape (..., 16)."""

    coord_shape = (limb.L,)

    @staticmethod
    def mul(a, b):
        return limb.mont_mul(FQ, a, b)

    @staticmethod
    def sqr(a):
        return limb.mont_sqr(FQ, a)

    @staticmethod
    def add(a, b):
        return limb.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return limb.sub(FQ, a, b)

    @staticmethod
    def neg(a):
        return limb.neg(FQ, a)

    @staticmethod
    def is_zero(a):
        return limb.is_zero(a)

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None], a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (limb.L,), limb.U32)

    @staticmethod
    def one(batch_shape):
        return jnp.broadcast_to(jnp.asarray(limb.int_to_limbs(_R)), batch_shape + (limb.L,))

    @staticmethod
    def inv(a):
        return limb.inv_mont(FQ, a)

    @staticmethod
    def from_int(x: int):
        return jnp.asarray(limb.int_to_limbs(x * _R % FQ_MOD))


class Fq2Ops:
    """Coordinate ops for Fq2 = Fq[u]/(u^2+1): element shape (..., 2, 16)."""

    coord_shape = (2, limb.L)

    @staticmethod
    def mul(a, b):
        # Karatsuba with the three Fq products STACKED into one batched
        # mont_mul: a single widening-conv subgraph instead of three. This
        # keeps the traced HLO for G2 point formulas the same size as G1's,
        # which matters for XLA compile time (the unstacked form tripled the
        # instruction count and sent XLA:CPU's passes superlinear).
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        am = jnp.stack([a0, a1, limb.add(FQ, a0, a1)], axis=-2)
        bm = jnp.stack([b0, b1, limb.add(FQ, b0, b1)], axis=-2)
        t = limb.mont_mul(FQ, am, bm)  # (..., 3, 16)
        t0, t1, t2 = t[..., 0, :], t[..., 1, :], t[..., 2, :]
        c0 = limb.sub(FQ, t0, t1)
        c1 = limb.sub(FQ, limb.sub(FQ, t2, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def sqr(a):
        # (c0 + c1 u)^2: c0' = (c0+c1)(c0-c1), c1' = 2 c0 c1 — two stacked muls
        a0, a1 = a[..., 0, :], a[..., 1, :]
        am = jnp.stack([limb.add(FQ, a0, a1), a0], axis=-2)
        bm = jnp.stack([limb.sub(FQ, a0, a1), a1], axis=-2)
        t = limb.mont_mul(FQ, am, bm)
        c0 = t[..., 0, :]
        c1 = limb.add(FQ, t[..., 1, :], t[..., 1, :])
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def add(a, b):
        return limb.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return limb.sub(FQ, a, b)

    @staticmethod
    def neg(a):
        return limb.neg(FQ, a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (2, limb.L), limb.U32)

    @staticmethod
    def one(batch_shape):
        c0 = jnp.broadcast_to(jnp.asarray(limb.int_to_limbs(_R)), batch_shape + (limb.L,))
        c1 = jnp.zeros(batch_shape + (limb.L,), limb.U32)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def inv(a):
        # 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 + c1^2) over Fq[u]/(u^2+1)
        c0, c1 = a[..., 0, :], a[..., 1, :]
        norm = limb.add(FQ, limb.mont_sqr(FQ, c0), limb.mont_sqr(FQ, c1))
        ninv = limb.inv_mont(FQ, norm)
        return jnp.stack(
            [
                limb.mont_mul(FQ, c0, ninv),
                limb.mont_mul(FQ, limb.neg(FQ, c1), ninv),
            ],
            axis=-2,
        )

    @staticmethod
    def from_ints(c0: int, c1: int):
        return jnp.asarray(
            np.stack([limb.int_to_limbs(c0 * _R % FQ_MOD), limb.int_to_limbs(c1 * _R % FQ_MOD)])
        )


def _stack(ops, elems):
    return jnp.stack(elems, axis=-(len(ops.coord_shape) + 1))


def _unstack(ops, arr, n: int):
    ax = arr.ndim - len(ops.coord_shape) - 1
    return [jnp.take(arr, i, axis=ax) for i in range(n)]


def mul_many(ops, pairs):
    """Independent field products stacked into ONE batched mul: fewer, larger
    kernels — smaller traced HLO (XLA compile time on the G2/Fq2 formulas was
    superlinear in instruction count) and better MXU utilization for the limb
    conv matmul on TPU."""
    out = ops.mul(_stack(ops, [a for a, _ in pairs]), _stack(ops, [b for _, b in pairs]))
    return _unstack(ops, out, len(pairs))


def sqr_many(ops, elems):
    out = ops.sqr(_stack(ops, elems))
    return _unstack(ops, out, len(elems))


def point_double(ops, p):
    """Jacobian doubling (a = 0 curve). Infinity-safe (Z=0 stays Z=0)."""
    x, y, z = p
    a, b = sqr_many(ops, [x, y])
    c, t = sqr_many(ops, [b, ops.add(x, b)])
    d = ops.add(ops.sub(ops.sub(t, a), c), ops.sub(ops.sub(t, a), c))  # 2(t-a-c)
    e = ops.add(ops.add(a, a), a)  # 3a
    f = ops.sqr(e)
    x3 = ops.sub(f, ops.add(d, d))
    c8 = ops.add(ops.add(c, c), ops.add(c, c))
    c8 = ops.add(c8, c8)
    y3m, z3 = mul_many(ops, [(e, ops.sub(d, x3)), (ops.add(y, y), z)])
    y3 = ops.sub(y3m, c8)
    return (x3, y3, z3)


def point_add(ops, p, q):
    """Complete Jacobian addition via branchless selects."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = ops.is_zero(z1)
    q_inf = ops.is_zero(z2)

    z1z1, z2z2 = sqr_many(ops, [z1, z2])
    u1, u2, t1, t2 = mul_many(
        ops, [(x1, z2z2), (x2, z1z1), (y1, z2), (y2, z1)]
    )
    s1, s2 = mul_many(ops, [(t1, z2z2), (t2, z1z1)])
    h = ops.sub(u2, u1)
    r = ops.sub(s2, s1)
    h_zero = ops.is_zero(h)
    r_zero = ops.is_zero(r)

    hh, rr = sqr_many(ops, [h, r])
    hhh, v, w = mul_many(ops, [(h, hh), (u1, hh), (z1, z2)])
    x3 = ops.sub(ops.sub(rr, hhh), ops.add(v, v))
    ya, yb, z3 = mul_many(ops, [(r, ops.sub(v, x3)), (s1, hhh), (w, h)])
    y3 = ops.sub(ya, yb)

    dbl = point_double(ops, p)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    is_dbl = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    is_cancel = jnp.logical_and(both, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))

    x3 = ops.select(is_dbl, dbl[0], x3)
    y3 = ops.select(is_dbl, dbl[1], y3)
    z3 = ops.select(is_dbl, dbl[2], z3)
    z3 = ops.select(is_cancel, ops.zeros(z3.shape[: -len(ops.coord_shape)]), z3)
    # inputs at infinity
    x3 = ops.select(p_inf, x2, x3)
    y3 = ops.select(p_inf, y2, y3)
    z3 = ops.select(p_inf, z2, z3)
    x3 = ops.select(q_inf, x1, x3)
    y3 = ops.select(q_inf, y1, y3)
    z3 = ops.select(q_inf, z1, z3)
    return (x3, y3, z3)


def point_neg(ops, p):
    x, y, z = p
    return (x, ops.neg(y), z)


def point_select(ops, cond, p, q):
    return tuple(ops.select(cond, a, b) for a, b in zip(p, q))


def infinity(ops, batch_shape=()):
    return (ops.one(batch_shape), ops.one(batch_shape), ops.zeros(batch_shape))


def tree_reduce(ops, p):
    """Sum a batch of points along the leading axis via a log-depth add tree."""
    x, y, z = p
    m = x.shape[0]
    while m > 1:
        half = m // 2
        a = (x[:half], y[:half], z[:half])
        b = (x[half : 2 * half], y[half : 2 * half], z[half : 2 * half])
        s = point_add(ops, a, b)
        if m % 2:
            x = jnp.concatenate([s[0], x[2 * half :]], axis=0)
            y = jnp.concatenate([s[1], y[2 * half :]], axis=0)
            z = jnp.concatenate([s[2], z[2 * half :]], axis=0)
            m = half + 1
        else:
            x, y, z = s
            m = half
    return (x[0], y[0], z[0])


def to_affine_host(ops_name: str, p) -> tuple | None:
    """Host-side Jacobian->affine for a single point (python ints)."""
    from ..field.ref import FQ_MOD as Q

    def dec(v):
        # Montgomery -> canonical int
        r_inv = pow(_R, Q - 2, Q)
        if np.asarray(v).ndim == 1:
            return limb.limbs_to_int(np.asarray(v)) * r_inv % Q
        return tuple(limb.limbs_to_int(np.asarray(v)[i]) * r_inv % Q for i in range(2))

    x, y, z = (np.asarray(c) for c in p)
    if ops_name == "fq":
        zi = dec(z)
        if zi == 0:
            return None
        xi, yi = dec(x), dec(y)
        zinv = pow(zi, Q - 2, Q)
        return (xi * zinv * zinv % Q, yi * zinv * zinv % Q * zinv % Q)
    else:
        z0, z1 = dec(z)
        if z0 == 0 and z1 == 0:
            return None
        from ..field.ref import fq2_inv, fq2_mul, fq2_sqr

        zinv = fq2_inv((z0, z1))
        zinv2 = fq2_sqr(zinv)
        zinv3 = fq2_mul(zinv2, zinv)
        return (fq2_mul(dec(x), zinv2), fq2_mul(dec(y), zinv3))


# ---------------------------------------------------------------------------
# host <-> device point conversion
# ---------------------------------------------------------------------------


def g1_points_to_device(points) -> tuple:
    """List of affine G1 python-int points (or None) -> Jacobian device arrays
    (m, 16) x3 in Montgomery form."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(_R)  # arbitrary; Z = 0 marks infinity
            ys.append(_R)
            zs.append(0)
        else:
            xs.append(pt[0] * _R % FQ_MOD)
            ys.append(pt[1] * _R % FQ_MOD)
            zs.append(_R)
    return (
        jnp.asarray(limb.ints_to_limbs(xs)),
        jnp.asarray(limb.ints_to_limbs(ys)),
        jnp.asarray(limb.ints_to_limbs(zs)),
    )


def g2_points_to_device(points) -> tuple:
    """List of affine G2 ((x0,x1),(y0,y1)) points (or None) -> Jacobian device
    arrays (m, 2, 16) x3 in Montgomery form."""

    def enc2(c):
        return [c[0] * _R % FQ_MOD, c[1] * _R % FQ_MOD]

    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append([_R, 0])
            ys.append([_R, 0])
            zs.append([0, 0])
        else:
            xs.append(enc2(pt[0]))
            ys.append(enc2(pt[1]))
            zs.append([_R, 0])
    shape = (len(points), 2, limb.L)
    return (
        jnp.asarray(limb.ints_to_limbs([v for p_ in xs for v in p_]).reshape(shape)),
        jnp.asarray(limb.ints_to_limbs([v for p_ in ys for v in p_]).reshape(shape)),
        jnp.asarray(limb.ints_to_limbs([v for p_ in zs for v in p_]).reshape(shape)),
    )


def affine_mont_batch(ops_name: str, p):
    """Device Jacobian batch -> (x_aff, y_aff, inf_mask), coordinates affine
    in Montgomery form. One batched field inversion per point (elementwise
    Fermat pow — fully parallel over the batch). Used by the .zkey exporter,
    whose point encoding is exactly Montgomery LE bytes."""
    ops = FqOps if ops_name == "fq" else Fq2Ops
    x, y, z = p
    batch_shape = z.shape[: -len(ops.coord_shape)]
    inf = ops.is_zero(z)
    zsafe = ops.select(inf, ops.one(batch_shape), z)
    zinv = ops.inv(zsafe)
    zinv2 = ops.sqr(zinv)
    xa = ops.mul(x, zinv2)
    ya = ops.mul(y, ops.mul(zinv2, zinv))
    zero = ops.zeros(batch_shape)
    return ops.select(inf, zero, xa), ops.select(inf, zero, ya), inf
