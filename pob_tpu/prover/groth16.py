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


@functools.lru_cache(maxsize=None)
def _window_table(group: str):
    """Host-built windowed fixed-base table: table[w][v] = v * 2^(8w) * G,
    w in [0, 32), v in [0, 256). Returns device Jacobian arrays with leading
    axes (N_WINDOWS, 256)."""
    if group == "g1":
        gen, add, to_dev = G1_GEN, g1_add, curve.g1_points_to_device
    else:
        from ..field.ref import g2_add

        gen, add, to_dev = G2_GEN, g2_add, curve.g2_points_to_device
    rows = []
    base = gen
    for _ in range(msm.N_WINDOWS):
        row, acc = [None], None
        for _ in range(255):
            acc = add(acc, base)
            row.append(acc)
        rows.append(row)
        for _ in range(8):  # base <- 256 * base
            base = add(base, base)
    dev = to_dev([p for row in rows for p in row])
    return tuple(c.reshape((msm.N_WINDOWS, 256) + c.shape[1:]) for c in dev)


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


def setup(cs: ConstraintSystem, rng=None) -> tuple[ProvingKey, VerifyingKey]:
    """Trusted setup (toxic waste sampled locally — fine for benchmarking and
    self-verification; production would use a ceremony)."""
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


@functools.partial(jax.jit, static_argnums=(0, 1))
def _msm_batch_kernel(group: str, n_tiles: int, points, scalars):
    """scalars: (B, m, 16); shared points. Pippenger tile count is scaled so
    the combined (B x 32 windows x tiles) scatter lane width stays constant —
    the bucket merge and the 255-step weighted reduction (the fixed serial
    cost that dominates a single proof) then run B-wide, which is where
    batching wins on the VPU."""
    pip, small = (
        (msm.pippenger_msm_g1, msm.msm_g1)
        if group == "g1"
        else (msm.pippenger_msm_g2, msm.msm_g2)
    )
    if int(points[0].shape[0]) >= 4096:
        return jax.vmap(lambda s: pip(points, s, n_tiles))(scalars)
    return jax.vmap(lambda s: small(points, s))(scalars)


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
    W = jnp.asarray(witness_batch)
    B = int(W.shape[0])
    # keep the combined (B x 32 windows x tiles) scatter lane width ~2-4k
    n_tiles = max(8, 64 // max(1, B))
    h = _h_batch_kernel(pk.k, pk.mats, W)
    npub = pk.num_public
    a_sum = _msm_batch_kernel("g1", n_tiles, pk.a_query, W)
    b1_sum = _msm_batch_kernel("g1", n_tiles, pk.b1_query, W)
    b2_sum = _msm_batch_kernel("g2", n_tiles, pk.b2_query, W)
    c_l = (
        _msm_batch_kernel("g1", n_tiles, pk.l_query, W[:, npub + 1 :])
        if int(pk.l_query[0].shape[0]) > 0
        else None
    )
    c_h = _msm_batch_kernel("g1", n_tiles, pk.h_query, h)
    sums = (a_sum, b1_sum, b2_sum, c_l, c_h)
    proofs = []
    for i in range(B):
        si = jax.tree_util.tree_map(lambda c: c[i], sums)
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
