"""Pure-Python BN254 golden reference.

Scalar field Fr (the circuit field; same modulus as the reference's
tests/poseidon.py:1-3), base field Fq, the Fq2/Fq6-free polynomial tower Fq12,
curve groups G1/G2 and the optimal-ate pairing. Everything here is the
bit-exactness oracle for the JAX device kernels, and the host-side verifier
for Groth16 proofs.

Curve: y^2 = x^3 + 3 over Fq; G2 lives on the D-twist y^2 = x^3 + 3/(9+u)
over Fq2 = Fq[u]/(u^2+1). The pairing follows the textbook optimal-ate
construction (Miller loop over 6x+2, two Frobenius line steps, final
exponentiation), with G2 points untwisted into E(Fq12).
"""

from __future__ import annotations

# BN254 scalar-field modulus (circuit field; reference tests/poseidon.py:1-3).
FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# BN254 base-field modulus.
FQ_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583
# BN parameter x: p(x)=36x^4+36x^3+24x^2+6x+1, r(x)=36x^4+36x^3+18x^2+6x+1.
BN_X = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_X + 2  # 29793968203157093288

CURVE_B = 3  # E: y^2 = x^3 + 3


def inv_mod(a: int, m: int) -> int:
    return pow(a % m, m - 2, m)


# ---------------------------------------------------------------------------
# Extension tower: Fq12 = Fq[w] / (w^12 - 18 w^6 + 82)
#   (w^6 = 9 + u with u^2 = -1  =>  (w^6 - 9)^2 = -1)
# Fq2 = Fq[u]/(u^2+1) elements are pairs (c0, c1) meaning c0 + c1*u.
# ---------------------------------------------------------------------------

FQ12_POLY = (82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0)  # w^12 = 18 w^6 - 82


class Fq12:
    """Element of Fq12 as a degree-<12 polynomial in w over Fq."""

    __slots__ = ("c",)

    def __init__(self, coeffs):
        assert len(coeffs) == 12
        self.c = tuple(x % FQ_MOD for x in coeffs)

    @staticmethod
    def one() -> "Fq12":
        return Fq12((1,) + (0,) * 11)

    @staticmethod
    def zero() -> "Fq12":
        return Fq12((0,) * 12)

    @staticmethod
    def from_fq(x: int) -> "Fq12":
        return Fq12((x,) + (0,) * 11)

    @staticmethod
    def from_fq2(c0: int, c1: int) -> "Fq12":
        # u = w^6 - 9
        co = [0] * 12
        co[0] = (c0 - 9 * c1) % FQ_MOD
        co[6] = c1 % FQ_MOD
        return Fq12(co)

    def __add__(self, o: "Fq12") -> "Fq12":
        return Fq12(tuple(a + b for a, b in zip(self.c, o.c)))

    def __sub__(self, o: "Fq12") -> "Fq12":
        return Fq12(tuple(a - b for a, b in zip(self.c, o.c)))

    def __neg__(self) -> "Fq12":
        return Fq12(tuple(-a for a in self.c))

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq12(tuple(a * o for a in self.c))
        t = [0] * 23
        a, b = self.c, o.c
        for i in range(12):
            ai = a[i]
            if ai:
                for j in range(12):
                    t[i + j] += ai * b[j]
        # reduce w^k for k >= 12 via w^12 = 18 w^6 - 82
        for k in range(22, 11, -1):
            v = t[k]
            if v:
                t[k] = 0
                t[k - 6] += 18 * v
                t[k - 12] -= 82 * v
        return Fq12(tuple(t[:12]))

    __rmul__ = __mul__

    def __eq__(self, o) -> bool:
        return isinstance(o, Fq12) and self.c == o.c

    def __pow__(self, e: int) -> "Fq12":
        if e < 0:
            return self.inv() ** (-e)
        r = Fq12.one()
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r

    def inv(self) -> "Fq12":
        # Extended Euclid over Fq[w] against the modulus polynomial.
        lm, hm = [1] + [0] * 12, [0] * 13
        low = list(self.c) + [0]
        high = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0, 1]

        def deg(p):
            for d in range(len(p) - 1, -1, -1):
                if p[d] % FQ_MOD:
                    return d
            return 0

        def poly_rounded_div(a, b):
            dega, degb = deg(a), deg(b)
            temp = [x for x in a]
            o = [0] * len(a)
            binv = inv_mod(b[degb], FQ_MOD)
            for i in range(dega - degb, -1, -1):
                o[i] = (o[i] + temp[degb + i] * binv) % FQ_MOD
                for c in range(degb + 1):
                    temp[c + i] = (temp[c + i] - o[c] * b[c]) % FQ_MOD
            return [x % FQ_MOD for x in o[: deg(o) + 1]]

        while deg(low):
            r = poly_rounded_div(high, low)
            r += [0] * (13 - len(r))
            nm = [x for x in hm]
            new = [x for x in high]
            for i in range(13):
                for j in range(13 - i):
                    nm[i + j] -= lm[i] * r[j]
                    new[i + j] -= low[i] * r[j]
            nm = [x % FQ_MOD for x in nm]
            new = [x % FQ_MOD for x in new]
            lm, low, hm, high = nm, new, lm, low
        c0 = inv_mod(low[0], FQ_MOD)
        return Fq12(tuple((x * c0) % FQ_MOD for x in lm[:12]))

    def is_one(self) -> bool:
        return self.c[0] == 1 and all(x == 0 for x in self.c[1:])

    def __repr__(self):
        return f"Fq12({self.c})"


# ---------------------------------------------------------------------------
# Fq2 helpers (pairs of ints) for G2 arithmetic
# ---------------------------------------------------------------------------


def fq2_add(a, b):
    return ((a[0] + b[0]) % FQ_MOD, (a[1] + b[1]) % FQ_MOD)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % FQ_MOD, (a[1] - b[1]) % FQ_MOD)


def fq2_neg(a):
    return ((-a[0]) % FQ_MOD, (-a[1]) % FQ_MOD)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u) with u^2 = -1
    t0 = a[0] * b[0]
    t1 = a[1] * b[1]
    t2 = (a[0] + a[1]) * (b[0] + b[1])
    return ((t0 - t1) % FQ_MOD, (t2 - t0 - t1) % FQ_MOD)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_scalar(a, k: int):
    return ((a[0] * k) % FQ_MOD, (a[1] * k) % FQ_MOD)


def fq2_inv(a):
    d = inv_mod(a[0] * a[0] + a[1] * a[1], FQ_MOD)
    return ((a[0] * d) % FQ_MOD, (-a[1] * d) % FQ_MOD)


FQ2_ONE = (1, 0)
FQ2_ZERO = (0, 0)
# 3 / (9 + u): the twist curve constant b' for G2.
TWIST_B = fq2_mul((3, 0), fq2_inv((9, 1)))


# ---------------------------------------------------------------------------
# Group elements. Affine tuples; None = point at infinity.
# G1: (x, y) ints.  G2: ((x0,x1), (y0,y1)) Fq2 pairs.
# ---------------------------------------------------------------------------

G1_GEN = (1, 2)
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g1_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - CURVE_B) % FQ_MOD == 0


def g2_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    lhs = fq2_sqr(y)
    rhs = fq2_add(fq2_mul(fq2_sqr(x), x), TWIST_B)
    return lhs == rhs


def g1_neg(p):
    if p is None:
        return None
    return (p[0], (-p[1]) % FQ_MOD)


def g1_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % FQ_MOD == 0:
            return None
        lam = (3 * x1 * x1) * inv_mod(2 * y1, FQ_MOD) % FQ_MOD
    else:
        lam = (y2 - y1) * inv_mod(x2 - x1, FQ_MOD) % FQ_MOD
    x3 = (lam * lam - x1 - x2) % FQ_MOD
    y3 = (lam * (x1 - x3) - y1) % FQ_MOD
    return (x3, y3)


def g1_mul(p, k: int):
    k %= FR_MOD
    r = None
    a = p
    while k:
        if k & 1:
            r = g1_add(r, a)
        a = g1_add(a, a)
        k >>= 1
    return r


def g2_neg(p):
    if p is None:
        return None
    return (p[0], fq2_neg(p[1]))


def g2_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if fq2_add(y1, y2) == FQ2_ZERO:
            return None
        lam = fq2_mul(fq2_scalar(fq2_sqr(x1), 3), fq2_inv(fq2_scalar(y1, 2)))
    else:
        lam = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
    x3 = fq2_sub(fq2_sub(fq2_sqr(lam), x1), x2)
    y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(p, k: int):
    k %= FR_MOD
    r = None
    a = p
    while k:
        if k & 1:
            r = g2_add(r, a)
        a = g2_add(a, a)
        k >>= 1
    return r


# ---------------------------------------------------------------------------
# Pairing: untwist G2 into E(Fq12), Miller loop, final exponentiation.
# ---------------------------------------------------------------------------


def _twist(p):
    """Map a G2 point on the twist into E(Fq12): (x*w^2, y*w^3) after u -> w^6-9."""
    if p is None:
        return None
    (x0, x1), (y0, y1) = p
    nx = Fq12.from_fq2(x0, x1)
    ny = Fq12.from_fq2(y0, y1)
    w = Fq12((0, 1) + (0,) * 10)
    return (nx * (w * w), ny * (w * w * w))


def _cast_g1(p):
    if p is None:
        return None
    return (Fq12.from_fq(p[0]), Fq12.from_fq(p[1]))


def _linefunc(p1, p2, t):
    """Evaluate the line through p1,p2 (on E(Fq12)) at point t."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 == x2 and y1 == y2:
        m_num = 3 * (x1 * x1)
        m_den = 2 * y1
    elif x1 == x2:
        return xt - x1
    else:
        m_num = y2 - y1
        m_den = x2 - x1
    # (yt - y1) * m_den - m_num * (xt - x1), projective trick avoiding inversion
    return (yt - y1) * m_den - m_num * (xt - x1)


def _ec12_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) == Fq12.zero() or (y1 + y2).c == (0,) * 12:
            return None
        lam = (3 * (x1 * x1)) * (2 * y1).inv()
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def _frob_fq12_pt(p):
    """Frobenius endomorphism on an E(Fq12) point: coordinate-wise x -> x^q."""
    return (p[0] ** FQ_MOD, p[1] ** FQ_MOD)


def miller_loop(q_tw, p_cast) -> Fq12:
    if q_tw is None or p_cast is None:
        return Fq12.one()
    r = q_tw
    f = Fq12.one()
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = f * f * _linefunc(r, r, p_cast)
        r = _ec12_add(r, r)
        if ATE_LOOP_COUNT & (1 << i):
            f = f * _linefunc(r, q_tw, p_cast)
            r = _ec12_add(r, q_tw)
    q1 = _frob_fq12_pt(q_tw)
    nq2 = _frob_fq12_pt(q1)
    nq2 = (nq2[0], -nq2[1])
    f = f * _linefunc(r, q1, p_cast)
    r = _ec12_add(r, q1)
    f = f * _linefunc(r, nq2, p_cast)
    return f


_FINAL_EXP = (FQ_MOD**12 - 1) // FR_MOD


def pairing(g1_pt, g2_pt) -> Fq12:
    """Optimal-ate pairing e(P, Q) for P in G1, Q in G2."""
    if g1_pt is None or g2_pt is None:
        return Fq12.one()
    assert g1_is_on_curve(g1_pt), "G1 point not on curve"
    assert g2_is_on_curve(g2_pt), "G2 point not on curve"
    f = miller_loop(_twist(g2_pt), _cast_g1(g1_pt))
    return f**_FINAL_EXP


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(Pi, Qi) == 1 by multiplying Miller-loop outputs and doing a
    single final exponentiation (the Groth16 verification shape)."""
    f = Fq12.one()
    for g1_pt, g2_pt in pairs:
        if g1_pt is None or g2_pt is None:
            continue
        f = f * miller_loop(_twist(g2_pt), _cast_g1(g1_pt))
    return (f**_FINAL_EXP).is_one()
