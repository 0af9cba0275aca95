"""Groth16 over BN254: setup, prove, verify.

The reference stops at R1CS + witness and delegates proving to
snarkjs/rapidsnark (SURVEY.md §2.8, circuitscan.yml:27-39); here the prover is
native to the framework: QAP evaluations and the toxic-waste polynomial
evaluations happen host-side once per circuit, every per-proof computation
(sparse A/B/C matvecs, NTT/coset division for h(x), all MSMs) runs on device.

Proof system follows Groth16 exactly (and snarkjs conventions for wire
ordering: [1, publics..., privates...]):
  A = alpha + sum w_i u_i(tau) + r delta
  B = beta  + sum w_i v_i(tau) + s delta
  C = sum_priv w_i (beta u_i + alpha v_i + w_i)/delta + h(tau) Z(tau)/delta
      + s A + r B1 - r s delta
Verification: e(A, B) = e(alpha, beta) e(IC(pub), gamma) e(C, delta)."""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FR as FRS
from ..field.ref import (
    FR_MOD,
    G1_GEN,
    G2_GEN,
    g1_add,
    g1_mul,
    g1_neg,
    g2_mul,
    pairing_product_is_one,
)
from ..r1cs.builder import ConstraintSystem
from . import curve, msm, ntt

_R = (1 << 256) % FR_MOD
_R2_FR = _R * _R % FR_MOD


def _next_pow2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


def _inv(x):
    return pow(x % FR_MOD, FR_MOD - 2, FR_MOD)


@dataclass
class ProvingKey:
    k: int  # log2 domain size
    num_public: int
    alpha1: tuple  # host affine points
    beta1: tuple
    delta1: tuple
    beta2: tuple
    delta2: tuple
    a_query: tuple  # device Jacobian (nw,)
    b1_query: tuple
    b2_query: tuple  # device Jacobian G2 (nw,)
    l_query: tuple  # device Jacobian (nw - num_public - 1,)
    h_query: tuple  # device Jacobian (n - 1,)
    # device COO matrices: (rows i32, cols i32, coeffs MontMont (nnz,16))
    mats: tuple


@dataclass
class VerifyingKey:
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: list  # affine G1, len num_public + 1


def _lagrange_at_tau(k: int, tau: int):
    """L_j(tau) for j in [0, 2^k): omega^j (tau^n - 1) / (n (tau - omega^j))."""
    n = 1 << k
    w = ntt.domain_root(k)
    zt = (pow(tau, n, FR_MOD) - 1) % FR_MOD
    # batch inversion of (tau - w^j)
    pws = []
    acc = 1
    for _ in range(n):
        pws.append(acc)
        acc = acc * w % FR_MOD
    denoms = [(tau - p) % FR_MOD for p in pws]
    # Montgomery trick
    prefix = [1]
    for d in denoms:
        prefix.append(prefix[-1] * d % FR_MOD)
    inv_all = _inv(prefix[-1])
    invs = [0] * n
    for j in range(n - 1, -1, -1):
        invs[j] = inv_all * prefix[j] % FR_MOD
        inv_all = inv_all * denoms[j] % FR_MOD
    n_inv = _inv(n)
    return [pws[j] * zt % FR_MOD * invs[j] % FR_MOD * n_inv % FR_MOD for j in range(n)]


def _poly_evals_at_tau(coo, lag, nw):
    """u_i(tau) = sum over (row j, wire i, coeff c): c * L_j(tau)."""
    rows, cols, coeffs = coo
    out = [0] * nw
    for j, i, c in zip(rows, cols, coeffs):
        out[i] = (out[i] + c * lag[j]) % FR_MOD
    return out


def _g1_table():
    pts = []
    p = G1_GEN
    for _ in range(256):
        pts.append(p)
        p = g1_add(p, p)
    return curve.g1_points_to_device(pts)


def _g2_table():
    from ..field.ref import g2_add

    pts = []
    p = G2_GEN
    for _ in range(256):
        pts.append(p)
        p = g2_add(p, p)
    return curve.g2_points_to_device(pts)


def _fixed_base_g1(scalars):
    """List of Fr ints -> device Jacobian G1 points (len,)."""
    bits = msm.scalar_bits(jnp.asarray(limb.ints_to_limbs(scalars)))
    return jax.jit(lambda t, b: msm.fixed_base_msm(curve.FqOps, t, b))(_g1_table(), bits)


def _fixed_base_g2(scalars):
    bits = msm.scalar_bits(jnp.asarray(limb.ints_to_limbs(scalars)))
    return jax.jit(lambda t, b: msm.fixed_base_msm(curve.Fq2Ops, t, b))(_g2_table(), bits)


def _mats_to_device(cs: ConstraintSystem):
    out = []
    for coo in cs.matrices():
        rows, cols, coeffs = coo
        # coeffs stored as c * R^2 so mont_mul(coeff, canonical_w) lands in
        # Montgomery form directly
        cf = limb.ints_to_limbs([c * _R2_FR % FR_MOD for c in coeffs]) if len(coeffs) else np.zeros((0, limb.L), np.uint32)
        out.append((jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)), jnp.asarray(cf)))
    return tuple(out)


def setup(cs: ConstraintSystem, rng=None) -> tuple[ProvingKey, VerifyingKey]:
    """Trusted setup (toxic waste sampled locally — fine for benchmarking and
    self-verification; production would use a ceremony)."""
    rnd = rng or (lambda: secrets.randbelow(FR_MOD - 1) + 1)
    tau, alpha, beta, gamma, delta = (rnd() for _ in range(5))
    k = max(1, _next_pow2(cs.num_constraints))
    n = 1 << k
    nw = cs.num_wires
    npub = cs.num_public

    lag = _lagrange_at_tau(k, tau)
    mats = cs.matrices()
    u_tau = _poly_evals_at_tau(mats[0], lag, nw)
    v_tau = _poly_evals_at_tau(mats[1], lag, nw)
    w_tau = _poly_evals_at_tau(mats[2], lag, nw)

    gamma_inv = _inv(gamma)
    delta_inv = _inv(delta)
    zt = (pow(tau, n, FR_MOD) - 1) % FR_MOD

    ic_scalars = [
        (beta * u_tau[i] + alpha * v_tau[i] + w_tau[i]) % FR_MOD * gamma_inv % FR_MOD
        for i in range(npub + 1)
    ]
    l_scalars = [
        (beta * u_tau[i] + alpha * v_tau[i] + w_tau[i]) % FR_MOD * delta_inv % FR_MOD
        for i in range(npub + 1, nw)
    ]
    h_scalars = [pow(tau, j, FR_MOD) * zt % FR_MOD * delta_inv % FR_MOD for j in range(n - 1)]

    a_query = _fixed_base_g1(u_tau)
    b1_query = _fixed_base_g1(v_tau)
    b2_query = _fixed_base_g2(v_tau)
    l_query = _fixed_base_g1(l_scalars) if l_scalars else curve.infinity(curve.FqOps, (0,))
    h_query = _fixed_base_g1(h_scalars)
    ic_dev = _fixed_base_g1(ic_scalars)
    ic = [curve.to_affine_host("fq", tuple(c[i] for c in ic_dev)) for i in range(npub + 1)]

    pk = ProvingKey(
        k=k,
        num_public=npub,
        alpha1=g1_mul(G1_GEN, alpha),
        beta1=g1_mul(G1_GEN, beta),
        delta1=g1_mul(G1_GEN, delta),
        beta2=g2_mul(G2_GEN, beta),
        delta2=g2_mul(G2_GEN, delta),
        a_query=a_query,
        b1_query=b1_query,
        b2_query=b2_query,
        l_query=l_query,
        h_query=h_query,
        mats=_mats_to_device(cs),
    )
    vk = VerifyingKey(
        alpha1=pk.alpha1,
        beta2=pk.beta2,
        gamma2=g2_mul(G2_GEN, gamma),
        delta2=pk.delta2,
        ic=ic,
    )
    return pk, vk


# ---------------------------------------------------------------------------
# device-side per-proof computation
# ---------------------------------------------------------------------------


def sparse_matvec_mont(mat, witness, n: int):
    """COO (rows, cols, coeffs=c*R^2) x canonical witness -> (n, 16) Montgomery.

    Per-row term counts are small (< 2^16), so raw limb accumulators fit u32;
    one Montgomery renormalization per output row."""
    rows, cols, coeffs = mat
    terms = limb.mont_mul(FRS, coeffs, witness[cols])  # (nnz, 16) Montgomery
    sums = jax.ops.segment_sum(terms, rows, num_segments=n)  # limbs < k * 2^16
    padded = jnp.zeros((n, 2 * limb.L), limb.U32).at[:, : limb.L].set(sums)
    norm, _ = limb._carry_prop(padded)
    red = limb.mont_reduce(FRS, norm)  # = S * R^{-1}
    return limb.mont_mul(FRS, red, jnp.asarray(limb.int_to_limbs(_R2_FR)))  # = S


def compute_h(pk: ProvingKey, witness):
    """QAP division: h coefficients (n-1, 16) canonical limbs."""
    k = pk.k
    n = 1 << k
    aw = sparse_matvec_mont(pk.mats[0], witness, n)
    bw = sparse_matvec_mont(pk.mats[1], witness, n)
    cw = sparse_matvec_mont(pk.mats[2], witness, n)
    ia = ntt.intt(aw, k)
    ib = ntt.intt(bw, k)
    ic_ = ntt.intt(cw, k)
    ea = ntt.coeffs_to_coset_evals(ia, k)
    eb = ntt.coeffs_to_coset_evals(ib, k)
    ec = ntt.coeffs_to_coset_evals(ic_, k)
    zinv = pow(ntt.z_on_coset(k), FR_MOD - 2, FR_MOD) * _R % FR_MOD
    h_evals = limb.mont_mul(
        FRS,
        limb.sub(FRS, limb.mont_mul(FRS, ea, eb), ec),
        jnp.asarray(limb.int_to_limbs(zinv)),
    )
    h_coeffs = ntt.coset_evals_to_coeffs(h_evals, k)
    return limb.from_mont(FRS, h_coeffs[: n - 1])


def _single_scalar_mul(ops, point_host, scalar: int):
    dev = (
        curve.g1_points_to_device([point_host])
        if ops is curve.FqOps
        else curve.g2_points_to_device([point_host])
    )
    sc = jnp.asarray(limb.ints_to_limbs([scalar % FR_MOD]))
    return msm.msm(ops, dev, sc)


def prove(pk: ProvingKey, witness_limbs, r: int | None = None, s: int | None = None):
    """witness_limbs: (num_wires, 16) canonical limbs with w[0] == 1.
    Returns (proof_a, proof_b, proof_c) as host affine points."""
    if r is None:
        r = secrets.randbelow(FR_MOD)
    if s is None:
        s = secrets.randbelow(FR_MOD)
    w = jnp.asarray(witness_limbs)
    npub = pk.num_public

    h = compute_h(pk, w)

    a_sum = msm.msm_g1(pk.a_query, w)
    b1_sum = msm.msm_g1(pk.b1_query, w)
    b2_sum = msm.msm_g2(pk.b2_query, w)
    c_l = (
        msm.msm_g1(pk.l_query, w[npub + 1 :])
        if int(pk.l_query[0].shape[0]) > 0
        else None
    )
    c_h = msm.msm_g1(pk.h_query, h)

    # host-side small combinations
    def aff1(p):
        return curve.to_affine_host("fq", p)

    def aff2(p):
        return curve.to_affine_host("fq2", p)

    from ..field.ref import g2_add

    A = g1_add(g1_add(pk.alpha1, aff1(a_sum)), g1_mul(pk.delta1, r))
    B2 = g2_add(g2_add(pk.beta2, aff2(b2_sum)), g2_mul(pk.delta2, s))
    B1 = g1_add(g1_add(pk.beta1, aff1(b1_sum)), g1_mul(pk.delta1, s))

    C = aff1(c_h)
    if c_l is not None:
        C = g1_add(C, aff1(c_l))
    C = g1_add(C, g1_mul(A, s))
    C = g1_add(C, g1_mul(B1, r))
    C = g1_add(C, g1_neg(g1_mul(pk.delta1, r * s % FR_MOD)))
    return (A, B2, C)


def verify(vk: VerifyingKey, proof, public_inputs) -> bool:
    """public_inputs: list of Fr ints (len num_public)."""
    A, B2, C = proof
    ic = vk.ic[0]
    for x, pt in zip(public_inputs, vk.ic[1:]):
        ic = g1_add(ic, g1_mul(pt, x))
    return pairing_product_is_one(
        [
            (g1_neg(A), B2),
            (vk.alpha1, vk.beta2),
            (ic, vk.gamma2),
            (C, vk.delta2),
        ]
    )
