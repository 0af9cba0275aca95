"""Prover kernel tests: NTT vs naive evaluation, curve ops and MSM vs the
python-int golden reference."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from pob_tpu.field import limb
from pob_tpu.field.limb import FR as FRS
from pob_tpu.field.ref import (
    FR_MOD,
    G1_GEN,
    G2_GEN,
    g1_add,
    g1_mul,
    g2_mul,
)
from pob_tpu.prover import curve, msm, ntt

rng = random.Random(1234)
_R = (1 << 256) % FR_MOD


def to_mont_fr(xs):
    return jnp.asarray(limb.ints_to_limbs([x * _R % FR_MOD for x in xs]))


def from_mont_fr(arr):
    rinv = pow(_R, FR_MOD - 2, FR_MOD)
    return [limb.limbs_to_int(v) * rinv % FR_MOD for v in np.asarray(arr)]


def test_ntt_roundtrip_and_values():
    k = 4
    n = 1 << k
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    a = to_mont_fr(coeffs)
    evals = jax.jit(lambda a: ntt.ntt(a, k))(a)
    w = ntt.domain_root(k)
    vals = from_mont_fr(evals)
    for i in [0, 1, 7, 15]:
        x = pow(w, i, FR_MOD)
        expect = sum(c * pow(x, j, FR_MOD) for j, c in enumerate(coeffs)) % FR_MOD
        assert vals[i] == expect, i
    back = from_mont_fr(jax.jit(lambda a: ntt.intt(a, k))(evals))
    assert back == coeffs


def test_coset_and_z():
    k = 3
    n = 1 << k
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    a = to_mont_fr(coeffs)
    ev = jax.jit(lambda a: ntt.coeffs_to_coset_evals(a, k))(a)
    vals = from_mont_fr(ev)
    w = ntt.domain_root(k)
    g = ntt.COSET_SHIFT
    for i in [0, 3, 7]:
        x = g * pow(w, i, FR_MOD) % FR_MOD
        expect = sum(c * pow(x, j, FR_MOD) for j, c in enumerate(coeffs)) % FR_MOD
        assert vals[i] == expect
        assert (pow(x, n, FR_MOD) - 1) % FR_MOD == ntt.z_on_coset(k)
    back = from_mont_fr(jax.jit(lambda e: ntt.coset_evals_to_coeffs(e, k))(ev))
    assert back == coeffs


def test_g1_add_double_vs_ref():
    pts = [g1_mul(G1_GEN, k) for k in [1, 2, 5, 7, 11]]
    dev = curve.g1_points_to_device(pts + [None])
    # pairwise adds: (P0+P1, P2+P3, P4+inf)
    a = tuple(c[0::2] for c in dev)
    b = tuple(c[1::2] for c in dev)
    out = jax.jit(lambda a, b: curve.point_add(curve.FqOps, a, b))(a, b)
    expect = [g1_add(pts[0], pts[1]), g1_add(pts[2], pts[3]), pts[4]]
    for i, e in enumerate(expect):
        aff = curve.to_affine_host("fq", tuple(c[i] for c in out))
        assert aff == e, i
    # doubling P0 (also via add(P,P) select path)
    out2 = jax.jit(lambda a: curve.point_add(curve.FqOps, a, a))(a)
    assert curve.to_affine_host("fq", tuple(c[0] for c in out2)) == g1_mul(G1_GEN, 2)
    # cancel: P + (-P) = inf
    nb = jax.jit(lambda a: curve.point_neg(curve.FqOps, a))(a)
    out3 = jax.jit(lambda a, b: curve.point_add(curve.FqOps, a, b))(a, nb)
    assert curve.to_affine_host("fq", tuple(c[0] for c in out3)) is None


def test_msm_g1_vs_ref():
    m = 8
    scalars = [rng.randrange(FR_MOD) for _ in range(m)]
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(m)]
    dev_pts = curve.g1_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(lambda p, s: msm.msm_g1(p, s))(dev_pts, dev_sc)
    expect = None
    for s, p in zip(scalars, pts):
        expect = g1_add(expect, g1_mul(p, s))
    assert curve.to_affine_host("fq", out) == expect


def test_msm_g2_vs_ref():
    m = 4
    scalars = [rng.randrange(FR_MOD) for _ in range(m)]
    pts = [g2_mul(G2_GEN, rng.randrange(1, 1000)) for _ in range(m)]
    dev_pts = curve.g2_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(lambda p, s: msm.msm_g2(p, s))(dev_pts, dev_sc)
    from pob_tpu.field.ref import g2_add

    expect = None
    for s, p in zip(scalars, pts):
        expect = g2_add(expect, g2_mul(p, s))
    assert curve.to_affine_host("fq2", out) == expect


def test_fixed_base_msm():
    # table of 2^b * G
    table_pts = []
    p = G1_GEN
    for _ in range(256):
        table_pts.append(p)
        p = g1_add(p, p)
    table = curve.g1_points_to_device(table_pts)
    scalars = [rng.randrange(FR_MOD) for _ in range(5)]
    bits = msm.scalar_bits(jnp.asarray(limb.ints_to_limbs(scalars)))
    out = jax.jit(lambda t, b: msm.fixed_base_msm(curve.FqOps, t, b))(table, bits)
    for i, s in enumerate(scalars):
        aff = curve.to_affine_host("fq", tuple(c[i] for c in out))
        assert aff == g1_mul(G1_GEN, s)


def test_pippenger_msm_g1_vs_ref():
    m = 13  # not a multiple of tiles: exercises padding
    scalars = [rng.randrange(FR_MOD) for _ in range(m)] + [0]
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(m)] + [None]
    dev_pts = curve.g1_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(lambda p, s: msm.pippenger_msm_g1(p, s, n_tiles=4))(dev_pts, dev_sc)
    expect = None
    for s, p in zip(scalars, pts):
        expect = g1_add(expect, g1_mul(p, s) if p is not None else None)
    assert curve.to_affine_host("fq", out) == expect


def test_pippenger_msm_dense_vs_ref():
    """Dense one-hot bucket variant (the XLA:TPU scatter workaround) must
    agree with the classic form and the host reference, incl. padding."""
    m = 13
    scalars = [rng.randrange(FR_MOD) for _ in range(m)] + [0]
    pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(m)] + [None]
    dev_pts = curve.g1_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(
        lambda p, s: msm.pippenger_msm_dense(curve.FqOps, p, s, n_tiles=4)
    )(dev_pts, dev_sc)
    expect = None
    for s, p in zip(scalars, pts):
        expect = g1_add(expect, g1_mul(p, s) if p is not None else None)
    assert curve.to_affine_host("fq", out) == expect


def test_pippenger_msm_dense_g2_vs_ref():
    m = 5
    scalars = [rng.randrange(FR_MOD) for _ in range(m)]
    pts = [g2_mul(G2_GEN, rng.randrange(1, 1000)) for _ in range(m)]
    dev_pts = curve.g2_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(
        lambda p, s: msm.pippenger_msm_dense(curve.Fq2Ops, p, s, n_tiles=2)
    )(dev_pts, dev_sc)
    from pob_tpu.field.ref import g2_add

    expect = None
    for s, p in zip(scalars, pts):
        expect = g2_add(expect, g2_mul(p, s))
    assert curve.to_affine_host("fq2", out) == expect


def test_pippenger_msm_g2_vs_ref():
    m = 5
    scalars = [rng.randrange(FR_MOD) for _ in range(m)]
    pts = [g2_mul(G2_GEN, rng.randrange(1, 1000)) for _ in range(m)]
    dev_pts = curve.g2_points_to_device(pts)
    dev_sc = jnp.asarray(limb.ints_to_limbs(scalars))
    out = jax.jit(lambda p, s: msm.pippenger_msm_g2(p, s, n_tiles=2))(dev_pts, dev_sc)
    from pob_tpu.field.ref import g2_add

    expect = None
    for s, p in zip(scalars, pts):
        expect = g2_add(expect, g2_mul(p, s))
    assert curve.to_affine_host("fq2", out) == expect
