"""Groth16 over BN254: setup, prove, verify.

The reference stops at R1CS + witness and delegates proving to
snarkjs/rapidsnark (SURVEY.md §2.8, circuitscan.yml:27-39); here the prover is
native to the framework: QAP evaluations and the toxic-waste polynomial
evaluations happen host-side once per circuit, every per-proof computation
(sparse A/B/C matvecs, NTT/coset division for h(x), all MSMs) runs on device.

Proof system follows Groth16 exactly, in snarkjs's conventions so proving
keys round-trip through the .zkey format (serialize.write_zkey/read_zkey):
wire ordering [1, publics..., privates...]; nPublic+1 extra binding rows
appended to the A matrix (one per public wire, coefficient 1) so the public
u_i(tau) are linearly independent; C evaluations on the domain computed
pointwise as A.B (identical polynomial for satisfying witnesses, one sparse
matvec cheaper); and the h-MSM basis is the *coset-Lagrange* basis
H_j = [ x_j (tau^{2n} - 1) / (2 n delta (tau - x_j)) ]_1 over the coset
x_j = w_{2n} w_n^j, so the prover MSMs the coset evaluations of A.B - C
directly — no division by Z, no inverse transform back to coefficients:
  A = alpha + sum w_i u_i(tau) + r delta
  B = beta  + sum w_i v_i(tau) + s delta
  C = sum_priv w_i (beta u_i + alpha v_i + w_i)/delta + h(tau) Z(tau)/delta
      + s A + r B1 - r s delta
Verification: e(A, B) = e(alpha, beta) e(IC(pub), gamma) e(C, delta)."""

from __future__ import annotations

import functools
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
    h_query: tuple  # device Jacobian (n,), coset-Lagrange basis (snarkjs)
    # device COO matrices (A with binding rows, B):
    # (rows i32, cols i32, coeffs c*R^2 (nnz,16))
    mats: tuple
    # width-classified/compacted witness-MSM plan (attach_msm_plan); the
    # prover falls back to plain full-width MSMs when absent
    plan: object = None


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


@functools.partial(jax.jit, static_argnums=(0,))
def _window_table_kernel(group: str, gen):
    """table[w, v] = v * 2^(8w) * G on device: 256 sequential doublings give
    D[j] = 2^j G (one scan), then v*2^(8w)*G = sum over set bits i of v of
    D[8w + i] — 8 masked point-adds at (32, 256) lane width."""
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops
    g0 = tuple(c[0] for c in gen)

    def dbl(p, _):
        return curve.point_double(ops, p), p

    _, D = jax.lax.scan(dbl, g0, None, length=256)  # D[j] = 2^j * G
    Dw = tuple(c.reshape((msm.N_WINDOWS, 8) + c.shape[1:]) for c in D)
    v = jnp.arange(256)
    acc = curve.infinity(ops, (msm.N_WINDOWS, 256))
    for i in range(8):
        bit = jnp.broadcast_to(((v >> i) & 1).astype(bool), (msm.N_WINDOWS, 256))
        base = tuple(
            jnp.broadcast_to(c[:, i : i + 1], (msm.N_WINDOWS, 256) + c.shape[2:])
            for c in Dw
        )
        acc = curve.point_select(ops, bit, curve.point_add(ops, acc, base), acc)
    return acc


@functools.lru_cache(maxsize=None)
def _window_table(group: str):
    """Windowed fixed-base table: table[w][v] = v * 2^(8w) * G, w in [0, 32),
    v in [0, 256), as device Jacobian arrays with leading axes (N_WINDOWS,
    256). Built entirely on device (_window_table_kernel) — the host-Python
    version did 8,160 sequential G2 adds and dominated setup latency."""
    gen = (
        curve.g1_points_to_device([G1_GEN])
        if group == "g1"
        else curve.g2_points_to_device([G2_GEN])
    )
    return _window_table_kernel(group, gen)


_SETUP_CHUNK = 1 << 17


@functools.lru_cache(maxsize=None)
def _fixed_base_fn(group: str):
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops
    return jax.jit(lambda t, s: msm.windowed_fixed_base_msm(ops, t, s))


def _fixed_base(group: str, scalars, chunk: int = _SETUP_CHUNK):
    """scalars: (m, 16) canonical Fr limbs (device) -> (m,) device Jacobian
    points scalar_i * G, computed in bounded-memory chunks via the windowed
    table (32 gathered point adds per scalar)."""
    table = _window_table(group)
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops
    m = int(scalars.shape[0])
    if m == 0:
        return curve.infinity(ops, (0,))
    fn = _fixed_base_fn(group)
    outs = []
    for i in range(0, m, chunk):
        sc = scalars[i : i + chunk]
        mm = int(sc.shape[0])
        # pad to a power of two so compiles are shared across query sizes
        # (zero scalars multiply to infinity and are sliced away)
        mp = max(64, 1 << (mm - 1).bit_length())
        if mp != mm:
            sc = jnp.concatenate([sc, jnp.zeros((mp - mm, limb.L), limb.U32)], axis=0)
        out = fn(table, sc)
        outs.append(tuple(c[:mm] for c in out))
    return tuple(jnp.concatenate([o[c] for o in outs], axis=0) for c in range(3))


@functools.partial(jax.jit, static_argnums=(0,))
def _lagrange_kernel(k: int, tau_m, mult):
    n = 1 << k
    w_m = jnp.asarray(limb.int_to_limbs(ntt.domain_root(k) * _R % FR_MOD))
    pws = limb.mont_powers_mont(FRS, w_m, n)
    denoms = limb.sub(FRS, jnp.broadcast_to(tau_m, pws.shape), pws)
    invs = limb.batch_inv_mont_scan(FRS, denoms)
    return limb.mont_mul(FRS, limb.mont_mul(FRS, pws, invs), mult)


def _lagrange_at_tau_mont_dev(k: int, tau: int):
    """Device (n, 16) Montgomery limbs of L_j(tau) = w^j (tau^n - 1) /
    (n (tau - w^j)) — the device twin of _lagrange_at_tau, using log-depth
    scans so 2^23-size domains (prod PoB) stay fast."""
    n = 1 << k
    zt_over_n = (pow(tau, n, FR_MOD) - 1) * _inv(n) % FR_MOD
    tau_m = jnp.asarray(limb.int_to_limbs(tau * _R % FR_MOD))
    mult = jnp.asarray(limb.int_to_limbs(zt_over_n * _R % FR_MOD))
    return _lagrange_kernel(k, tau_m, mult)


@functools.partial(jax.jit, static_argnums=(0,))
def _poly_kernel(nw: int, rows, cols, cf, lag_mont):
    cf_m = limb.to_mont(FRS, cf)
    terms = limb.mont_mul(FRS, cf_m, lag_mont[rows])
    s_lo = jax.ops.segment_sum(terms & 0xFF, cols, num_segments=nw)
    s_hi = jax.ops.segment_sum(terms >> 8, cols, num_segments=nw)

    def redc(s):  # wide sum (< 2^280) -> (sum * R^{-1}) mod p, canonical
        padded = jnp.zeros((nw, 2 * limb.L), limb.U32).at[:, : limb.L].set(s)
        norm, _ = limb._carry_prop(padded)
        return limb.mont_reduce(FRS, norm)

    c256 = jnp.asarray(limb.int_to_limbs(256 * _R % FR_MOD))
    # terms were Montgomery (x R): (S_lo + 256 S_hi) R^{-1} = sum x, canonical
    return limb.add(FRS, redc(s_lo), limb.mont_mul(FRS, redc(s_hi), c256))


def _poly_evals_dev(coo, lag_mont, nw: int):
    """Device twin of _poly_evals_at_tau: u_i(tau) = sum_{(j,i,c)} c L_j(tau)
    via one segment-sum over the COO. Returns (nw, 16) canonical limbs.

    The 16-bit limbs of the Montgomery terms are split into 8-bit halves
    before summation so u32 accumulators stay exact for up to 2^24 terms per
    wire column (the constant-wire column of the prod PoB system has ~10^7)."""
    rows, cols, cidx, pal = coo
    if len(cidx) == 0:
        return jnp.zeros((nw, limb.L), limb.U32)
    cf = jnp.asarray(limb.ints_to_limbs(pal)[np.asarray(cidx)])
    return _poly_kernel(
        nw,
        jnp.asarray(np.asarray(rows, np.int32)),
        jnp.asarray(np.asarray(cols, np.int32)),
        cf,
        lag_mont,
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _setup_scalars_kernel(npub: int, u, v, w, beta_m, alpha_m, ginv_m, dinv_m):
    """From the canonical QAP evals, derive the ic/l query scalars on device
    (canonical limbs). beta_m etc. are constants pre-multiplied by R."""
    k_dev = limb.add(
        FRS,
        limb.add(FRS, limb.mont_mul(FRS, u, beta_m), limb.mont_mul(FRS, v, alpha_m)),
        w,
    )
    ic_scalars = limb.mont_mul(FRS, k_dev[: npub + 1], ginv_m)
    l_scalars = limb.mont_mul(FRS, k_dev[npub + 1 :], dinv_m)
    return ic_scalars, l_scalars


@functools.partial(jax.jit, static_argnums=(0,))
def _h_scalars_kernel(k: int, tau_m, s_m, mult):
    """snarkjs coset-Lagrange h basis: x_j (tau^{2n}-1) / (2 n delta (tau-x_j))
    for x_j = s w^j, j in [0, n), canonical limbs. `mult` carries the scalar
    constant (tau^{2n}-1)/(2 n delta) in plain (non-Montgomery) form."""
    n = 1 << k
    w_m = jnp.asarray(limb.int_to_limbs(ntt.domain_root(k) * _R % FR_MOD))
    x = limb.mont_mul(FRS, limb.mont_powers_mont(FRS, w_m, n), s_m)
    denoms = limb.sub(FRS, jnp.broadcast_to(tau_m, x.shape), x)
    invs = limb.batch_inv_mont_scan(FRS, denoms)
    return limb.mont_mul(FRS, limb.mont_mul(FRS, x, invs), mult)


def snarkjs_matrices(cs: ConstraintSystem):
    """(A, B) host COOs in snarkjs layout: the A matrix gains nPublic+1
    binding rows (row m+i: 1 * wire_i), coefficient 1, B side zero — trivially
    satisfied, but they make the public-wire u_i(tau) linearly independent
    (snarkjs zkey_new does the same). The C matrix is not needed by the
    prover: on the domain its evaluations equal A.B pointwise.

    Returns COOs with materialized coefficient values (for serialization)."""
    (ra, ca_, ia), (rb, cb, ib), _mc, pal = cs.matrices_indexed()
    extra = np.arange(cs.num_public + 1, dtype=np.int64)
    rows = np.concatenate([ra, cs.num_constraints + extra])
    cols = np.concatenate([ca_, extra])
    coeffs = np.concatenate([pal[ia], np.ones(len(extra), dtype=object)])
    return (rows, cols, coeffs), (rb, cb, pal[ib])


def _indexed_matrices(cs: ConstraintSystem):
    """(A+binding rows, B, C) as palette-indexed COOs (rows, cols, cidx, pal)."""
    (ra, ca_, ia), mb, mc, pal = cs.matrices_indexed()
    extra = np.arange(cs.num_public + 1, dtype=np.int64)
    rows = np.concatenate([ra, cs.num_constraints + extra])
    cols = np.concatenate([ca_, extra])
    # palette index 0 is always the coefficient 1 (builder invariant)
    cidx = np.concatenate([ia, np.zeros(len(extra), np.int32)])
    pal_list = [int(c) for c in pal]
    return (
        (rows, cols, cidx, pal_list),
        (*mb, pal_list),
        (*mc, pal_list),
    )


def _mats_to_device(host_mats):
    """Palette-indexed host COOs -> device (rows, cols, coeff-limb) triples.
    Coefficients are stored as c * R^2 so mont_mul(coeff, canonical_w) lands
    in Montgomery form directly; the palette gather keeps the host-side
    conversion O(palette) python + one vectorized take."""
    out = []
    for rows, cols, cidx, pal in host_mats:
        if len(cidx):
            pal_r2 = limb.ints_to_limbs([int(c) * _R2_FR % FR_MOD for c in pal])
            cf = pal_r2[np.asarray(cidx)]
        else:
            cf = np.zeros((0, limb.L), np.uint32)
        out.append(
            (
                jnp.asarray(rows.astype(np.int32)),
                jnp.asarray(cols.astype(np.int32)),
                jnp.asarray(cf),
            )
        )
    return tuple(out)


def setup(cs: ConstraintSystem, rng=None, plan: bool = True) -> tuple[ProvingKey, VerifyingKey]:
    """Trusted setup (toxic waste sampled locally — fine for benchmarking and
    self-verification; production would use a ceremony). plan=False skips the
    classified-MSM plan (and its doubling-expansion compile) — useful where
    compile latency matters more than prove throughput (dryruns, tiny
    circuits)."""
    rnd = rng or (lambda: secrets.randbelow(FR_MOD - 1) + 1)
    tau, alpha, beta, gamma, delta = (rnd() for _ in range(5))
    npub = cs.num_public
    k = max(1, _next_pow2(cs.num_constraints + npub + 1))
    n = 1 << k
    nw = cs.num_wires

    lag = _lagrange_at_tau_mont_dev(k, tau)
    mat_a, mat_b, mat_c = _indexed_matrices(cs)
    u_tau = _poly_evals_dev(mat_a, lag, nw)  # (nw, 16) canonical, device
    v_tau = _poly_evals_dev(mat_b, lag, nw)
    w_tau = _poly_evals_dev(mat_c, lag, nw)

    gamma_inv = _inv(gamma)
    delta_inv = _inv(delta)

    def const(c):  # constant pre-scaled by R so mont_mul(x, cR) = x c
        return jnp.asarray(limb.int_to_limbs(c * _R % FR_MOD))

    ic_scalars, l_scalars = _setup_scalars_kernel(
        npub, u_tau, v_tau, w_tau, const(beta), const(alpha),
        const(gamma_inv), const(delta_inv),
    )
    s = ntt.domain_root(k + 1)  # coset shift w_{2n}: s^n = -1
    c0 = (pow(tau, 2 * n, FR_MOD) - 1) * _inv(2 * n % FR_MOD) % FR_MOD
    c0 = c0 * delta_inv % FR_MOD
    h_scalars = _h_scalars_kernel(
        k, const(tau), const(s), jnp.asarray(limb.int_to_limbs(c0))
    )

    a_query = _fixed_base("g1", u_tau)
    b1_query = _fixed_base("g1", v_tau)
    b2_query = _fixed_base("g2", v_tau)
    l_query = _fixed_base("g1", l_scalars)
    h_query = _fixed_base("g1", h_scalars)
    ic_dev = _fixed_base("g1", ic_scalars)
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
        mats=_mats_to_device((mat_a, mat_b)),
    )
    vk = VerifyingKey(
        alpha1=pk.alpha1,
        beta2=pk.beta2,
        gamma2=g2_mul(G2_GEN, gamma),
        delta2=pk.delta2,
        ic=ic,
    )
    if plan:
        attach_msm_plan(pk, cs)
    return pk, vk


def setup_host(cs: ConstraintSystem, rng=None) -> tuple[ProvingKey, VerifyingKey]:
    """Pure-host trusted setup for SMALL circuits (tests, dryruns): identical
    key material to setup(), but every computation is python-int arithmetic —
    zero device programs compiled. setup() compiles ~10 programs (two
    256-step window-table scans among them), which on a slow CPU host costs
    minutes the multichip dryrun cannot afford (VERDICT r04 item 2); here the
    only device interaction is the final host->device array upload. Cost is
    O(n * nw) bigint ops — intended for domains 2^k <= ~2^10."""
    rnd = rng or (lambda: secrets.randbelow(FR_MOD - 1) + 1)
    tau, alpha, beta, gamma, delta = (rnd() for _ in range(5))
    npub = cs.num_public
    k = max(1, _next_pow2(cs.num_constraints + npub + 1))
    n = 1 << k
    nw = cs.num_wires

    lag = _lagrange_at_tau(k, tau)
    mat_a, mat_b, mat_c = _indexed_matrices(cs)

    def devalued(m):  # palette-indexed COO -> value COO
        rows, cols, cidx, pal = m
        return rows, cols, [pal[i] for i in cidx]

    u = _poly_evals_at_tau(devalued(mat_a), lag, nw)
    v = _poly_evals_at_tau(devalued(mat_b), lag, nw)
    w = _poly_evals_at_tau(devalued(mat_c), lag, nw)
    ginv, dinv = _inv(gamma), _inv(delta)
    kv = [(beta * u[i] + alpha * v[i] + w[i]) % FR_MOD for i in range(nw)]
    ic_scalars = [x * ginv % FR_MOD for x in kv[: npub + 1]]
    l_scalars = [x * dinv % FR_MOD for x in kv[npub + 1 :]]

    s = ntt.domain_root(k + 1)  # coset shift w_{2n}: s^n = -1
    c0 = (pow(tau, 2 * n, FR_MOD) - 1) * _inv(2 * n % FR_MOD) % FR_MOD
    c0 = c0 * dinv % FR_MOD
    wroot = ntt.domain_root(k)
    xs = []
    acc = s
    for _ in range(n):
        xs.append(acc)
        acc = acc * wroot % FR_MOD
    h_scalars = [
        x * c0 % FR_MOD * _inv((tau - x) % FR_MOD) % FR_MOD for x in xs
    ]

    def fb1(scalars):
        return curve.g1_points_to_device(
            [g1_mul(G1_GEN, x) if x else None for x in scalars]
        )

    def fb2(scalars):
        return curve.g2_points_to_device(
            [g2_mul(G2_GEN, x) if x else None for x in scalars]
        )

    pk = ProvingKey(
        k=k,
        num_public=npub,
        alpha1=g1_mul(G1_GEN, alpha),
        beta1=g1_mul(G1_GEN, beta),
        delta1=g1_mul(G1_GEN, delta),
        beta2=g2_mul(G2_GEN, beta),
        delta2=g2_mul(G2_GEN, delta),
        a_query=fb1(u),
        b1_query=fb1(v),
        b2_query=fb2(v),
        l_query=fb1(l_scalars),
        h_query=fb1(h_scalars),
        mats=_mats_to_device((mat_a, mat_b)),
    )
    vk = VerifyingKey(
        alpha1=pk.alpha1,
        beta2=pk.beta2,
        gamma2=g2_mul(G2_GEN, gamma),
        delta2=pk.delta2,
        ic=[g1_mul(G1_GEN, x) if x else None for x in ic_scalars],
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


def _compute_h_traced(k: int, mats, witness):
    """Coset evaluations of A.B - C (snarkjs h-MSM operand): (n, 16) canonical
    limbs, evaluated on the coset x_j = w_{2n} w_n^j. C on the domain is the
    pointwise product A.B (equal as polynomials for a satisfying witness), so
    only two sparse matvecs and 6 transforms are needed; the constant
    1/Z(coset) = -1/2 and the Lagrange->tau weights live in the H points."""
    n = 1 << k
    aw = sparse_matvec_mont(mats[0], witness, n)
    bw = sparse_matvec_mont(mats[1], witness, n)
    cw = limb.mont_mul(FRS, aw, bw)
    shift = ntt.domain_root(k + 1)
    ea = ntt.coeffs_to_coset_evals(ntt.intt(aw, k), k, shift)
    eb = ntt.coeffs_to_coset_evals(ntt.intt(bw, k), k, shift)
    ec = ntt.coeffs_to_coset_evals(ntt.intt(cw, k), k, shift)
    h_evals = limb.sub(FRS, limb.mont_mul(FRS, ea, eb), ec)
    return limb.from_mont(FRS, h_evals)


def compute_h(pk: ProvingKey, witness):
    """Coset evaluations of A.B - C: (n, 16) canonical limbs."""
    return _compute_h_traced(pk.k, pk.mats, witness)


# The batched prover runs as a handful of per-stage programs (h, then one per
# MSM query) instead of one monolithic kernel: a single program holding six
# 2^k-NTT buffers plus five MSM bucket/scan workspaces co-resident exceeded
# the v5e's 16G HBM (and at one point crashed the TPU worker); per-stage
# programs bound peak memory to one stage's working set, and the inter-stage
# tensors (the witness batch and h, tens of MB) stay on device.


@functools.partial(jax.jit, static_argnums=(0,))
def _h_batch_kernel(k: int, mats, W):
    return jax.vmap(lambda w: _compute_h_traced(k, mats, w))(W)


def _msm_dense_default() -> bool:
    """Dense one-hot Pippenger (msm.pippenger_msm_dense) on TPU by default:
    XLA:TPU serializes the classic formulation's bucket scatter at ~1-2us
    per index (r05 probe bisection — both the perf floor and the worker-kill
    cause). Measured on-chip at m=2^18 (probe_msm, r05): dense B=1/T=64
    7.1 s/MSM rc=0 vs ~15.6 s scatter-equivalent; B=2 runs but is slower
    per-MSM (25.9 s — bucket traffic scales with B), and chunk=8 faulted
    the worker — so dense launches run UNBATCHED (chunk=1, see _msm_chunk).
    CPU scatters are cheap, so the classic form stays the CPU default.
    POB_MSM_DENSE=0/1 overrides."""
    import os

    v = os.environ.get("POB_MSM_DENSE", "").strip().lower()
    if v in ("1", "true"):
        return True
    if v in ("0", "false"):
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def _msm_batch_kernel(group: str, n_tiles: int, points, scalars, dense=None):
    """scalars: (B, m, 16); shared points. Pippenger tile count is scaled so
    the combined (B x 32 windows x tiles) bucket lane width stays constant —
    the bucket merge and the 255-step weighted reduction (the fixed serial
    cost that dominates a single proof) then run B-wide, which is where
    batching wins on the VPU."""
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops
    small = msm.msm_g1 if group == "g1" else msm.msm_g2
    if dense is None:
        dense = _msm_dense_default()
    pip = msm.pippenger_msm_dense if dense else msm.pippenger_msm
    if int(points[0].shape[0]) >= 4096:
        return jax.vmap(lambda s: pip(ops, points, s, n_tiles))(scalars)
    return jax.vmap(lambda s: small(points, s))(scalars)


# ---------------------------------------------------------------------------
# width-classified witness MSMs
#
# The witness of these circuits is overwhelmingly BITS: keccak state wires,
# bit decompositions, one-hot selectors. A full 32-window Pippenger spends 32
# bucket-adds per point regardless, so classifying wires once at key time and
# running the bit-valued class through a single conditional-add sweep (1 add
# per point instead of 32) removes ~30x of the a/b1/b2/l MSM work. The
# classification is SOUND, not heuristic: a wire is in the bit class iff the
# constraint system contains its booleanity row w*w = w (constrain_boolean's
# exact single-term shape), which forces w in {0,1} for every satisfying
# witness. Infinity query points (wires absent from the matrix, u_i(tau)=0)
# are compacted away entirely — they contribute nothing for any scalar.
# ---------------------------------------------------------------------------


def classify_bit_wires(cs: ConstraintSystem) -> np.ndarray:
    """(num_wires,) bool: wires that hold a bit in any satisfying witness.

    Two sources, unioned:
    1. blocks declared width=1 at allocation (the gadget contract — covers
       keccak-internal wires whose booleanity is only provable by induction
       from the source-bit constraints, gadgets_cs.py module docstring);
    2. wires with an explicit booleanity row w*w = w in the COO (sound from
       the matrices alone; covers unannotated circuits).
    A wrong width annotation can only produce an invalid proof (self-verify
    catches it); verification soundness is unaffected."""
    declared = cs.bit_wires_declared() if hasattr(cs, "bit_wires_declared") else 0
    ma, mb, mc, _pal = cs.matrices_indexed()
    nrows = cs.num_constraints

    def single(rows, cols, cidx):
        cnt = np.bincount(rows, minlength=nrows)
        is_single = cnt == 1
        wire = np.full(nrows, -1, np.int64)
        ok = np.zeros(nrows, bool)
        m = is_single[rows]
        wire[rows[m]] = cols[m]
        ok[rows[m]] = cidx[m] == 0  # palette index 0 is the coefficient 1
        return is_single, wire, ok

    sa, wa, ka = single(*ma)
    sb, wb, kb = single(*mb)
    sc, wc, kc = single(*mc)
    rows_bool = sa & sb & sc & ka & kb & kc & (wa == wb) & (wb == wc)
    bit = np.zeros(cs.num_wires, bool)
    bit[wa[rows_bool]] = True
    return bit | declared


@dataclass
class MsmPlan:
    """Classified/compacted witness-MSM data in ALL-BITS form.

    Every query's MSM becomes ONE conditional-add sweep (`bitsum_msm`):
    bit-class wires contribute their point with their 0/1 witness value as
    the mask, and each FULL-width wire j is expanded at key time into 254
    doubled points 2^k P_j whose masks are the bits of w_j (computed on
    device from the witness limbs) — sum_j w_j P_j = sum_{j,k} bit_k(w_j)
    (2^k P_j). The expansion multiplies the full-class point count by 254,
    but full wires are <0.5% of these circuits (keccak-dominated witnesses),
    so total work stays ~= one add per bit wire — ~30x less than 32-window
    Pippenger over everything — and the whole a/b1/l (stacked, shared
    shapes) and b2 computation is TWO compiled programs. Program count is a
    stability constraint on the tunnel backend (see _stage docs in bench.py).

    Arrays (q = stacked query axis; g1 order [a, b1, l], g2 [b2]):
      g1_pts (3, M1, 16)x3   layout [bit pts | expanded full pts | inf pad]
      g1_bit_idx (3, mb1)  g1_full_idx (3, mf1)   — absolute wire indices
      g2_pts (1, M2, 2, 16)x3, g2_bit_idx (1, mb2), g2_full_idx (1, mf2)"""

    g1_pts: tuple
    g1_bit_idx: object
    g1_full_idx: object
    g2_pts: tuple
    g2_bit_idx: object
    g2_full_idx: object


jax.tree_util.register_dataclass(
    MsmPlan,
    data_fields=[
        "g1_pts", "g1_bit_idx", "g1_full_idx",
        "g2_pts", "g2_bit_idx", "g2_full_idx",
    ],
    meta_fields=[],
)

FULL_BITS = 254  # witness values are field elements < 2^254


@functools.partial(jax.jit, static_argnums=(0,))
def _expand_doublings_kernel(group: str, pts):
    """(mf, ...) Jacobian points -> (mf*FULL_BITS, ...) doubling chains
    [P, 2P, 4P, ...] per point, wire-major."""
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops

    def dbl(p, _):
        return curve.point_double(ops, p), p

    _, chain = jax.lax.scan(dbl, pts, None, length=FULL_BITS)  # (254, mf, ...)
    return tuple(
        jnp.moveaxis(c, 0, 1).reshape((-1,) + c.shape[2:]) for c in chain
    )


def attach_msm_plan(pk: ProvingKey, cs: ConstraintSystem,
                    cache_path: str | None = None) -> ProvingKey:
    """Build the all-bits plan (see MsmPlan) from the constraint system
    (also call this after load_zkey/load_pk — the .zkey format drops the C
    matrix, so the booleanity classification must come from the rebuilt
    ConstraintSystem). cache_path persists the computed plan arrays (.npz),
    skipping the device doubling-expansion on reload."""
    if cache_path is not None:
        import os

        if os.path.exists(cache_path):
            d = np.load(cache_path)
            pk.plan = MsmPlan(
                g1_pts=tuple(jnp.asarray(d[f"g1_pts{i}"]) for i in range(3)),
                g1_bit_idx=jnp.asarray(d["g1_bit_idx"]),
                g1_full_idx=jnp.asarray(d["g1_full_idx"]),
                g2_pts=tuple(jnp.asarray(d[f"g2_pts{i}"]) for i in range(3)),
                g2_bit_idx=jnp.asarray(d["g2_bit_idx"]),
                g2_full_idx=jnp.asarray(d["g2_full_idx"]),
            )
            return pk

    bit = classify_bit_wires(cs)
    npub = cs.num_public

    def masks(points, wire_offset: int):
        z = np.asarray(points[-1])
        live = ~(z.reshape(z.shape[0], -1) == 0).all(axis=1)
        wires = np.arange(len(live)) + wire_offset
        return bit[wires] & live, ~bit[wires] & live

    raw = {
        "a": (pk.a_query, 0),
        "b1": (pk.b1_query, 0),
        "b2": (pk.b2_query, 0),
        "l": (pk.l_query, npub + 1),
    }
    sizes = {n: masks(p, off) for n, (p, off) in raw.items()}

    def padded_to(n, mult):
        n = max(n, 1)
        mult = min(mult, 1 << (n - 1).bit_length())  # don't balloon tiny circuits
        return -(-n // mult) * mult

    def build(name, m_pts, m_bit, m_full):
        """Point block [bit pts | expanded full pts | inf pad] + idx arrays."""
        points, off = raw[name]
        is_bit, is_full = sizes[name]
        group = "g2" if name == "b2" else "g1"
        bidx = np.nonzero(is_bit)[0].astype(np.int64)
        fidx = np.nonzero(is_full)[0].astype(np.int64)
        host_pts = [np.asarray(c) for c in points]
        coords = []
        one = limb.int_to_limbs((1 << 256) % curve.FQ_MOD)
        if len(fidx):
            fexp = _expand_doublings_kernel(
                group, tuple(jnp.asarray(c[fidx]) for c in host_pts)
            )
            fexp = [np.asarray(c) for c in fexp]
        for ci, c in enumerate(host_pts):
            # layout MUST match the kernel's mask concat: bit block occupies
            # the pooled m_bit positions, expanded block starts at m_bit —
            # shorter queries leave infinity in their tails (their padded
            # gather indices read wire 0 == 1, times infinity == no-op)
            buf = np.zeros((m_pts,) + c.shape[1:], c.dtype)
            buf[: len(bidx)] = c[bidx]
            if len(fidx):
                buf[m_bit : m_bit + len(fidx) * FULL_BITS] = fexp[ci]
            if ci < 2:  # X, Y of infinity set to Montgomery 1 (Z stays 0)
                buf[len(bidx) : m_bit] = one
                buf[m_bit + len(fidx) * FULL_BITS :] = one
            coords.append(buf)
        bg = np.zeros(m_bit, np.int32)
        bg[: len(bidx)] = bidx + off
        fg = np.zeros(m_full, np.int32)
        fg[: len(fidx)] = fidx + off
        return coords, bg, fg

    def group_arrays(names):
        m_bit = max(int(sizes[n][0].sum()) for n in names)
        m_full = max(max(int(sizes[n][1].sum()) for n in names), 1)
        m_pts = padded_to(m_bit + m_full * FULL_BITS, 4096)
        parts = [build(n, m_pts, m_bit, m_full) for n in names]
        pts = tuple(
            jnp.asarray(np.stack([p[0][ci] for p in parts])) for ci in range(3)
        )
        bidx = jnp.asarray(np.stack([p[1] for p in parts]))
        fidx = jnp.asarray(np.stack([p[2] for p in parts]))
        return pts, bidx, fidx

    g1_pts, g1_bidx, g1_fidx = group_arrays(("a", "b1", "l"))
    g2_pts, g2_bidx, g2_fidx = group_arrays(("b2",))
    pk.plan = MsmPlan(
        g1_pts=g1_pts, g1_bit_idx=g1_bidx, g1_full_idx=g1_fidx,
        g2_pts=g2_pts, g2_bit_idx=g2_bidx, g2_full_idx=g2_fidx,
    )
    if cache_path is not None:
        arrs = {"g1_bit_idx": np.asarray(g1_bidx),
                "g1_full_idx": np.asarray(g1_fidx),
                "g2_bit_idx": np.asarray(g2_bidx),
                "g2_full_idx": np.asarray(g2_fidx)}
        for i in range(3):
            arrs[f"g1_pts{i}"] = np.asarray(g1_pts[i])
            arrs[f"g2_pts{i}"] = np.asarray(g2_pts[i])
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        import os

        os.replace(tmp, cache_path)
    return pk


def bitsum_msm(ops, points, bits, n_tiles: int = 64):
    """Sum of points[i] where bits[i] == 1: one conditional add per point,
    tiled like pippenger_msm. points: Jacobian leading axis m; bits: (m,)."""
    m = int(points[0].shape[0])
    T = 1 << max(0, (min(n_tiles, max(1, m)) - 1).bit_length())
    t = -(-m // T)
    pad = T * t - m
    if pad:
        inf = curve.infinity(ops, (pad,))
        points = tuple(jnp.concatenate([c, i], axis=0) for c, i in zip(points, inf))
        bits = jnp.concatenate([bits, jnp.zeros((pad,), bits.dtype)])
    pts = tuple(jnp.moveaxis(c.reshape((T, t) + c.shape[1:]), 1, 0) for c in points)
    bts = jnp.moveaxis(bits.reshape(T, t), 1, 0)  # (t, T)

    def step(acc, x):
        p, bvec = x
        added = curve.point_add(ops, acc, p)
        return curve.point_select(ops, bvec.astype(bool), added, acc), None

    acc, _ = jax.lax.scan(step, curve.infinity(ops, (T,)), (pts, bts))
    return curve.tree_reduce(ops, acc)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _planned_group_kernel(group: str, n_tiles: int, pts, bit_idx, full_idx, W):
    """All of a group's witness-MSM queries as ONE all-bits sweep program.

    pts: (q, M, ...) point blocks [bit pts | expanded full pts | inf pad];
    bit_idx (q, mb) / full_idx (q, mf) absolute wire gathers into W
    (B, nw, 16). Masks: bit wires contribute their 0/1 value directly; full
    wires contribute their 254 value bits against the pre-doubled points.
    Returns (q, B) Jacobian sums.

    One program per group (two total) — program count is a stability
    constraint on the tunnel backend (see bench.py stage docs), and the
    all-bits form needs no separate full-width MSM or recombination step."""
    ops = curve.FqOps if group == "g1" else curve.Fq2Ops
    q, M = pts[0].shape[0], pts[0].shape[1]
    bits_b = jnp.moveaxis(jnp.take(W, bit_idx, axis=1)[..., 0] & 1, 0, 1)  # (q,B,mb)
    full_sc = jnp.moveaxis(jnp.take(W, full_idx, axis=1), 0, 1)  # (q,B,mf,16)
    bits_f = limb.limbs_to_bits_le(full_sc, FULL_BITS).astype(jnp.uint32)
    bits_f = bits_f.reshape(bits_f.shape[:2] + (-1,))  # (q, B, mf*254)
    bits = jnp.concatenate([bits_b.astype(jnp.uint32), bits_f], axis=-1)
    pad = M - bits.shape[-1]
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    return jax.vmap(
        lambda p, bb: jax.vmap(lambda b: bitsum_msm(ops, p, b, n_tiles))(bb)
    )(pts, bits)


# Pippenger's bucket accumulation is a scatter, and XLA:TPU serializes
# scatter updates at ~1-2us per index; a batched MSM launch costs
# ~ 32 windows * chunk * m indices of wall time REGARDLESS of tile count
# (measured r05: B=1/T=64/m=156870 -> 6.1s, B=4/T=16 -> 34s, B=16/any T ->
# worker killed at ~90-130s; scripts/probe_msm.py). The tunnel's TPU worker
# dies when one program executes past roughly a minute, so launches are
# chunked along the batch axis to keep each program's scatter count below
# POB_MSM_IDX_BUDGET (~ <=35s of scatter wall time). The real fix is the
# scatter-free planned path (bitsum_msm) for witness queries; the full-width
# h MSM still pays this tax until a VMEM-bucket Pallas kernel lands.
_IDX_BUDGET = 20_000_000


def _msm_chunk(group: str, B: int, m: int) -> int:
    import os

    env = os.environ.get("POB_MSM_CHUNK", "")
    if env.strip():
        return max(1, min(B, int(env)))
    if _msm_dense_default():
        # dense bucket traffic scales with the chunk (~0.8 TB per batch
        # element at m=2^18): B=1 measured fastest per-MSM and chunk=8
        # faulted the TPU worker (r05) — run dense launches unbatched
        return 1
    budget = _IDX_BUDGET // (2 if group == "g2" else 1)
    return max(1, min(B, budget // (N_WINDOWS_IDX * max(1, m))))


N_WINDOWS_IDX = 32  # msm.N_WINDOWS; scatter indices per point per launch


def _msm_batched(group: str, points, scalars):
    """Batched Pippenger MSM, chunked along the batch axis (see note above).
    Chunk sizes are powers of two off a shared heuristic so at most two
    distinct programs (chunk shape + B=1 tail shape) compile per query
    shape. G2 (Fq2) halves the chunk: each point-add costs ~2x G1."""
    B = int(scalars.shape[0])
    m = int(points[0].shape[0])
    chunk = _msm_chunk(group, B, m)
    chunk = 1 << (chunk.bit_length() - 1)  # pow2: stable program shapes
    n_tiles = max(8, 64 // chunk)
    outs = [
        _msm_batch_kernel(group, n_tiles, points, scalars[i : i + chunk])
        for i in range(0, B - B % chunk, chunk)
    ]
    if B % chunk:  # ragged tail: per-proof calls reuse the B=1-shaped program
        tail = scalars[B - B % chunk :]
        outs += [
            _msm_batch_kernel(group, max(8, 64 // 1), points, tail[j : j + 1])
            for j in range(int(tail.shape[0]))
        ]
    return tuple(jnp.concatenate([o[c] for o in outs], axis=0) for c in range(3))


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
    Returns (proof_a, proof_b, proof_c) as host affine points.

    Routed through the staged batch path at B=1 so the compiled programs are
    shared with throughput-mode proving and peak HBM stays one stage's
    working set."""
    return prove_batch(pk, jnp.asarray(witness_limbs)[None], rs=[(r, s)])[0]


def prove_batch(pk: ProvingKey, witness_batch, rs=None):
    """Batched Groth16: witness_batch (B, num_wires, 16) canonical limbs ->
    list of B (A, B2, C) proofs. The per-proof MSM sums come out of ONE
    compiled device program (see _prove_batch_kernel); only the constant-size
    blinding fold runs on host per proof.

    This is the framework's throughput mode — the reference's proving stage
    (delegated to snarkjs/rapidsnark, Makefile:5-6) has no batch equivalent;
    BASELINE.json's north star (batched proofs/sec/chip) is measured here."""
    import os as _os

    W = jnp.asarray(witness_batch)
    B = int(W.shape[0])

    # POB_PROVE_SYNC=1: barrier + log after every device program so a TPU
    # worker crash is attributable to ONE stage instead of surfacing at the
    # final result fetch (BENCH_r04's undiagnosable failure mode)
    sync = _os.environ.get("POB_PROVE_SYNC", "0") == "1"

    def _barrier(name, x):
        if sync:
            import sys as _sys
            import time as _time

            t0 = _time.perf_counter()
            jax.block_until_ready(x)
            print(f"[prove-sync] {name} done ({_time.perf_counter()-t0:.1f}s)",
                  file=_sys.stderr, flush=True)
        return x

    h = _barrier("h", _h_batch_kernel(pk.k, pk.mats, W))
    npub = pk.num_public
    # tolerant parse: "", "0", "false" all mean unset (matches bench.py:211)
    no_plan_env = _os.environ.get("POB_NO_PLAN", "0").strip().lower()
    use_plan = pk.plan is not None and no_plan_env not in ("1", "true")
    if use_plan:
        bit_tiles = int(_os.environ.get("POB_BIT_TILES", "2048"))
        p = pk.plan
        # POB_PLAN_SPLIT=1 (default): run the three G1 queries as THREE
        # launches of ONE (q=1)-shaped program instead of a single fused
        # (q=3) mega-program. Same compiled-program count, one third the
        # per-launch working set — the fused form killed the tunnel's
        # remote-compile endpoint in r04 (VERDICT item 5).
        split = _os.environ.get("POB_PLAN_SPLIT", "1").strip().lower() \
            not in ("0", "false")
        if split:
            def one(q):
                return _planned_group_kernel(
                    "g1", bit_tiles, tuple(c[q : q + 1] for c in p.g1_pts),
                    p.g1_bit_idx[q : q + 1], p.g1_full_idx[q : q + 1], W,
                )

            a_sum = tuple(c[0] for c in _barrier("a-planned", one(0)))
            b1_sum = tuple(c[0] for c in _barrier("b1-planned", one(1)))
            c_l = tuple(c[0] for c in _barrier("l-planned", one(2)))
        else:
            g1 = _barrier(
                "g1-planned",
                _planned_group_kernel("g1", bit_tiles, p.g1_pts, p.g1_bit_idx,
                                      p.g1_full_idx, W),
            )
            a_sum = tuple(c[0] for c in g1)
            b1_sum = tuple(c[1] for c in g1)
            c_l = tuple(c[2] for c in g1)
        g2 = _barrier(
            "g2-planned",
            _planned_group_kernel("g2", bit_tiles, p.g2_pts, p.g2_bit_idx,
                                  p.g2_full_idx, W),
        )
        b2_sum = tuple(c[0] for c in g2)
    else:
        a_sum = _barrier("a", _msm_batched("g1", pk.a_query, W))
        b1_sum = _barrier("b1", _msm_batched("g1", pk.b1_query, W))
        b2_sum = _barrier("b2", _msm_batched("g2", pk.b2_query, W))
        c_l = (
            _barrier("l", _msm_batched("g1", pk.l_query, W[:, npub + 1 :]))
            if int(pk.l_query[0].shape[0]) > 0
            else None
        )
    c_h = _barrier("h-msm", _msm_batched("g1", pk.h_query, h))
    sums = (a_sum, b1_sum, b2_sum, c_l, c_h)
    # ONE device->host fetch of the five (B,)-batched MSM sums, then pure
    # numpy slicing. Slicing on device (tree_map c[i] over jax arrays)
    # dispatched B x 15 one-off slice programs, and that program flood —
    # not the MSM kernels, which all complete — is what crashed the TPU
    # worker at the first result fetch in BENCH_r03/r04 (probe_prove.py
    # bisection, r05).
    host_sums = jax.tree_util.tree_map(lambda c: np.asarray(c), sums)
    proofs = []
    for i in range(B):
        si = jax.tree_util.tree_map(lambda c: c[i], host_sums)
        r, s = rs[i] if rs is not None else (None, None)
        proofs.append(finish_proof(pk, si, r, s))
    return proofs


def finish_proof(pk: ProvingKey, sums, r: int | None = None, s: int | None = None):
    """Host-side tail of prove(): fold the five device MSM sums with the
    blinding scalars r, s into the final (A, B2, C) affine proof points."""
    if r is None:
        r = secrets.randbelow(FR_MOD)
    if s is None:
        s = secrets.randbelow(FR_MOD)
    a_sum, b1_sum, b2_sum, c_l, c_h = sums

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


# ---------------------------------------------------------------------------
# fast native key cache (npz of raw device arrays)
#
# write_zkey/load_zkey stay the snarkjs-compatible interchange path; this is
# the bench/ops cache: no affine conversion on write (the .zkey writer's
# batched Fermat inversions cost minutes at 2^18) and no per-coefficient
# python parse on load — just raw limb arrays.
# ---------------------------------------------------------------------------


def _enc_int(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(32, "little"), np.uint8)


def _enc_g1(p) -> np.ndarray:
    if p is None:
        return np.zeros(64, np.uint8)
    return np.concatenate([_enc_int(p[0]), _enc_int(p[1])])


def _enc_g2(p) -> np.ndarray:
    if p is None:
        return np.zeros(128, np.uint8)
    return np.concatenate([_enc_int(v) for c in p for v in c])


def _dec_int(a) -> int:
    return int.from_bytes(bytes(a), "little")


def _dec_g1(a):
    x, y = _dec_int(a[:32]), _dec_int(a[32:])
    return None if x == 0 and y == 0 else (x, y)


def _dec_g2(a):
    v = [_dec_int(a[32 * i : 32 * (i + 1)]) for i in range(4)]
    return None if all(c == 0 for c in v) else ((v[0], v[1]), (v[2], v[3]))


def save_pk(path: str, pk: ProvingKey, vk: VerifyingKey):
    """Persist pk+vk as raw arrays (seconds, vs minutes for write_zkey)."""
    arrs = {
        "k": np.int64(pk.k),
        "num_public": np.int64(pk.num_public),
        "alpha1": _enc_g1(pk.alpha1), "beta1": _enc_g1(pk.beta1),
        "delta1": _enc_g1(pk.delta1), "beta2": _enc_g2(pk.beta2),
        "delta2": _enc_g2(pk.delta2), "gamma2": _enc_g2(vk.gamma2),
        "ic": np.stack([_enc_g1(p) for p in vk.ic]),
    }
    for name in ("a_query", "b1_query", "b2_query", "l_query", "h_query"):
        for ci, c in enumerate(getattr(pk, name)):
            arrs[f"{name}{ci}"] = np.asarray(c)
    for mi, (rows, cols, cf) in enumerate(pk.mats):
        arrs[f"m{mi}_rows"] = np.asarray(rows)
        arrs[f"m{mi}_cols"] = np.asarray(cols)
        arrs[f"m{mi}_cf"] = np.asarray(cf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    import os

    os.replace(tmp, path)


def load_pk(path: str) -> tuple[ProvingKey, VerifyingKey]:
    d = np.load(path)
    pk = ProvingKey(
        k=int(d["k"]),
        num_public=int(d["num_public"]),
        alpha1=_dec_g1(d["alpha1"]),
        beta1=_dec_g1(d["beta1"]),
        delta1=_dec_g1(d["delta1"]),
        beta2=_dec_g2(d["beta2"]),
        delta2=_dec_g2(d["delta2"]),
        a_query=tuple(jnp.asarray(d[f"a_query{i}"]) for i in range(3)),
        b1_query=tuple(jnp.asarray(d[f"b1_query{i}"]) for i in range(3)),
        b2_query=tuple(jnp.asarray(d[f"b2_query{i}"]) for i in range(3)),
        l_query=tuple(jnp.asarray(d[f"l_query{i}"]) for i in range(3)),
        h_query=tuple(jnp.asarray(d[f"h_query{i}"]) for i in range(3)),
        mats=tuple(
            (
                jnp.asarray(d[f"m{mi}_rows"]),
                jnp.asarray(d[f"m{mi}_cols"]),
                jnp.asarray(d[f"m{mi}_cf"]),
            )
            for mi in range(2)
        ),
    )
    vk = VerifyingKey(
        alpha1=pk.alpha1,
        beta2=pk.beta2,
        gamma2=_dec_g2(d["gamma2"]),
        delta2=pk.delta2,
        ic=[_dec_g1(p) for p in d["ic"]],
    )
    return pk, vk


# ---------------------------------------------------------------------------
# snarkjs .zkey ingestion
# ---------------------------------------------------------------------------


def _affine_limbs_to_jac(arr, g2: bool = False):
    """(m, 2|4, 16) Montgomery affine limb array (all-zero = infinity) ->
    device Jacobian point arrays."""
    from ..field.ref import FQ_MOD

    arr = np.asarray(arr, np.uint32)
    m = arr.shape[0]
    inf = (arr == 0).all(axis=(1, 2))
    r_q = limb.int_to_limbs((1 << 256) % FQ_MOD)
    if g2:
        x = arr[:, 0:2, :]
        y = arr[:, 2:4, :]
        z = np.zeros((m, 2, limb.L), np.uint32)
        z[:, 0, :] = r_q
        z[inf] = 0
    else:
        x = arr[:, 0, :]
        y = arr[:, 1, :]
        z = np.broadcast_to(r_q, (m, limb.L)).copy()
        z[inf] = 0
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def load_zkey(path: str) -> tuple[ProvingKey, VerifyingKey]:
    """Build a device ProvingKey (+ VerifyingKey) from a snarkjs .zkey file,
    the format the reference's downstream Groth16 pipeline uses
    (circuitscan.yml:27-39 delegates to snarkjs; SURVEY.md §2.8)."""
    from .serialize import read_zkey

    d = read_zkey(path)
    k = _next_pow2(d["domain_size"])
    assert (1 << k) == d["domain_size"], "domain size must be a power of two"

    mats = []
    for midx in (0, 1):
        rows, cols, vals = d["coeffs"][midx]
        # no palette structure in a foreign zkey: identity index map
        mats.append(
            (
                np.asarray(rows, np.int64),
                np.asarray(cols, np.int64),
                np.arange(len(vals), dtype=np.int32),
                [int(v) for v in vals],
            )
        )

    pk = ProvingKey(
        k=k,
        num_public=d["n_public"],
        alpha1=d["alpha1"],
        beta1=d["beta1"],
        delta1=d["delta1"],
        beta2=d["beta2"],
        delta2=d["delta2"],
        a_query=_affine_limbs_to_jac(d["a_pts"]),
        b1_query=_affine_limbs_to_jac(d["b1_pts"]),
        b2_query=_affine_limbs_to_jac(d["b2_pts"], g2=True),
        l_query=_affine_limbs_to_jac(d["c_pts"]),
        h_query=_affine_limbs_to_jac(d["h_pts"]),
        mats=_mats_to_device(mats),
    )
    vk = VerifyingKey(
        alpha1=d["alpha1"],
        beta2=d["beta2"],
        gamma2=d["gamma2"],
        delta2=d["delta2"],
        ic=d["ic"],
    )
    return pk, vk
