"""Constraint-side gadget encodings shared by circuits: booleans, XOR chains,
bit decompositions (incl. the Num2Bits_strict alias check), Poseidon rounds,
Keccak-f rounds.

Every function here has a *witness-side twin* in pob_tpu.r1cs.witness that
produces the exact block tensors (same names, same order) on device; the
contract is enforced by ConstraintSystem.check_witness in tests.

Keccak emission is fully vectorized: each round emits a handful of numpy
bulk-chunks instead of ~6400 per-bit Python calls, and keccak-internal wires
(theta/chi outputs) carry NO boolean constraints — an XOR/AND output of
boolean operands is boolean by construction (out = a + b - 2ab), so only the
*source* bits (message-byte decompositions, value decompositions) are
boolean-constrained. This halves the keccak constraint count relative to a
naive encoding while keeping the system sound."""

from __future__ import annotations

import numpy as np

from ..field.ref import FR_MOD
from ..hash.poseidon_params import ROUNDS_F, ROUNDS_P, mds_matrix, round_constants
from .builder import ConstraintSystem
from .lc import INV2, lc_add, lc_const, lc_scale, lc_sub, lc_terms, lc_wire

# Keccak tables (shared with the device kernel pob_tpu/hash/keccak.py)
from ..hash.keccak import _SRC, _ROT, _RC, _CHI1, _CHI2  # noqa: F401

_NEG1 = FR_MOD - 1


def constrain_boolean(cs: ConstraintSystem, wires):
    """b * (b - 1) = 0 for each wire in the array (one bulk chunk)."""
    w = np.asarray(wires, np.int64).reshape(-1)
    n = len(w)
    if n == 0:
        return
    rows = np.arange(n)
    g = [(rows, w, 1)]
    cs.add_bulk(n, a=g, b=g, c=g)


def one_hot_cs(cs: ConstraintSystem, name: str, n: int, index_lc: dict):
    """One-hot selection vector: oh[i] in {0,1}, sum oh = 1, sum i*oh = index.

    Replaces circom's IsEqual-per-position pattern (selector.circom:21-46,
    Filter, Pad) without inverse hints; unsatisfiable when index is outside
    [0, n) — the same rejection circom's `sumIsEq === 1` provides."""
    oh = cs.alloc_block(name, (n,), width=1)
    constrain_boolean(cs, oh)
    total = lc_add(*[lc_wire(int(w)) for w in oh])
    constrain_linear_zero(cs, lc_sub(total, lc_const(1)))
    weighted = lc_add(*[lc_wire(int(oh[i]), i) for i in range(1, n)])
    constrain_linear_zero(cs, lc_sub(weighted, index_lc))
    return oh


def prefix_filter_cs(cs: ConstraintSystem, name: str, oh):
    """filter[i] = 1 iff i < index, given oh = one_hot(index) (Filter,
    array.circom:26-40). Linear chain of wires, one bulk chunk:
    f[0] - (1 - oh[0]) = 0;  f[i] - f[i-1] + oh[i] = 0."""
    n = len(oh)
    f = cs.alloc_block(name, (n,), width=1)
    rows = np.arange(n)
    a = [
        (rows, np.asarray(f, np.int64), 1),
        (rows, np.asarray(oh, np.int64), 1),
        (rows[1:], np.asarray(f[:-1], np.int64), _NEG1),
        (rows[:1], np.zeros(1, np.int64), _NEG1),
    ]
    cs.add_bulk(n, a=a, b=[(rows, np.zeros(n, np.int64), 1)])
    return f


def is_zero_cs(cs: ConstraintSystem, name: str, x_lcs: list):
    """IsZero for a list of LCs; allocates inverse-hint wires (the analog of
    circom's only non-deterministic hint besides Divide). Returns out wires.
    out = 1 - x*inv and x*out = 0."""
    n = len(x_lcs)
    inv = cs.alloc_block(f"{name}_inv", (n,))
    out = cs.alloc_block(f"{name}_out", (n,), width=1)
    for i, x in enumerate(x_lcs):
        cs.add(
            lc_terms(x),
            [(int(inv[i]), 1)],
            lc_terms(lc_sub(lc_const(1), lc_wire(int(out[i])))),
        )
        cs.add(lc_terms(x), [(int(out[i]), 1)], [])
    return out


def lt_bit_cs(cs: ConstraintSystem, name: str, a_lc: dict, b_lc: dict, k: int):
    """Boolean a < b for values already range-checked to k bits (circomlib
    LessThan): decompose a + 2^k - b into k+1 bits; out = 1 - bits[k]."""
    bits = cs.alloc_block(name, (k + 1,), width=1)
    val = lc_add(a_lc, lc_const(1 << k), lc_scale(b_lc, FR_MOD - 1))
    constrain_decomposition(cs, val, bits)
    return lc_sub(lc_const(1), lc_wire(int(bits[k])))


def mult_and_cs(cs: ConstraintSystem, name: str, bit_lcs: list):
    """AND of boolean LCs via a product chain; returns the output LC."""
    if len(bit_lcs) == 1:
        return bit_lcs[0]
    acc_w = cs.alloc_block(name, (len(bit_lcs) - 1,), width=1)
    acc = bit_lcs[0]
    for i in range(1, len(bit_lcs)):
        mul_lc(cs, int(acc_w[i - 1]), acc, bit_lcs[i])
        acc = lc_wire(int(acc_w[i - 1]))
    return acc


def constrain_linear_zero(cs: ConstraintSystem, lc: dict):
    """lc == 0 as (lc) * (1) = 0."""
    cs.add(lc_terms(lc), [(0, 1)], [])


def xor_lc(cs: ConstraintSystem, out_wire: int, a: dict, b: dict):
    """out = a XOR b for boolean LCs: a*b = (a + b - out)/2."""
    c = lc_scale(lc_sub(lc_add(a, b), lc_wire(out_wire)), INV2)
    cs.add(lc_terms(a), lc_terms(b), lc_terms(c))


def and_not_lc(cs: ConstraintSystem, out_wire: int, b: dict, c: dict):
    """out = (1 - b) AND c (the chi inner term)."""
    nb = lc_sub(lc_const(1), b)
    cs.add(lc_terms(nb), lc_terms(c), [(out_wire, 1)])


def mul_lc(cs: ConstraintSystem, out_wire: int, a: dict, b: dict):
    cs.add(lc_terms(a), lc_terms(b), [(out_wire, 1)])


def bits_lc(bit_wires) -> dict:
    """LC recomposing little-endian bit wires into a field value."""
    return {int(w): pow(2, i, FR_MOD) for i, w in enumerate(np.asarray(bit_wires))}


def constrain_decomposition(cs: ConstraintSystem, value_lc: dict, bit_wires):
    """bits are boolean and recompose to value_lc.

    For widths < 254 the decomposition is unique. For 254-bit widths callers
    MUST also call strict_bits_cs (Num2Bits_strict, convert.circom:46-56) or
    the encoding admits the x + p alias."""
    constrain_boolean(cs, bit_wires)
    constrain_linear_zero(cs, lc_sub(bits_lc(bit_wires), value_lc))


# p - 1 bits, LSB first (the CompConstant reference value of Num2Bits_strict)
P_MINUS_1_BITS = np.array([(FR_MOD - 1) >> i & 1 for i in range(254)], np.int64)
STRICT_ZERO_POS = np.nonzero(P_MINUS_1_BITS == 0)[0]  # positions with k_i = 0


def strict_bits_cs(cs: ConstraintSystem, name: str, bit_wires):
    """Canonical-decomposition (alias) check for a 254-bit boolean
    decomposition: constrains value(bits) <= p - 1, closing the x + p
    ambiguity that plain bit-recomposition admits. This is the role of
    circomlib's Num2Bits_strict / CompConstant (convert.circom:46-56).

    Encoding (MSB-first lexicographic compare against the constant p-1):
      t_i = (b_i == k_i)  [linear in b_i since k is constant]
      eq[i] = prod_{j >= i} t_j            — suffix-equality chain
      gt[m] = eq[i_m + 1] * b_{i_m}  for every position i_m with k_i = 0
      sum_m gt[m] = 0
    value > p-1 iff some zero-bit position of p-1 has b_i = 1 while all
    higher bits agree — exactly when some gt term is 1. All gt terms are
    boolean, so the linear sum-zero forces each to zero.

    Blocks: {name}_eq (254,), {name}_gt (len(STRICT_ZERO_POS),)."""
    b = np.asarray(bit_wires, np.int64).reshape(-1)
    n = len(b)
    assert n == 254, "strict check is defined for full-width decompositions"
    k = P_MINUS_1_BITS
    eq = cs.alloc_block(f"{name}_eq", (n,), width=1)
    rows = np.arange(n)
    ones = np.nonzero(k == 1)[0]
    zeros = STRICT_ZERO_POS
    # A = eq[i+1] (const 1 for i = n-1), B = t_i, C = eq[i]
    a = [
        (rows[:-1], np.asarray(eq[1:], np.int64), 1),
        (rows[-1:], np.zeros(1, np.int64), 1),
    ]
    bgrp = [
        (ones, b[ones], 1),  # k_i = 1: t_i = b_i
        (zeros, np.zeros(len(zeros), np.int64), 1),  # k_i = 0: t_i = 1 - b_i
        (zeros, b[zeros], _NEG1),
    ]
    cs.add_bulk(n, a=a, b=bgrp, c=[(rows, np.asarray(eq, np.int64), 1)])

    m = len(zeros)
    gt = cs.alloc_block(f"{name}_gt", (m,), width=1)
    grows = np.arange(m)
    # gt[m] = eq[i_m + 1] * b_{i_m}; i_m < 253 always (MSB of p-1 is 1)
    cs.add_bulk(
        m,
        a=[(grows, np.asarray(eq[zeros + 1], np.int64), 1)],
        b=[(grows, b[zeros], 1)],
        c=[(grows, np.asarray(gt, np.int64), 1)],
    )
    constrain_linear_zero(cs, lc_add(*[lc_wire(int(w)) for w in gt]))


def strict_decomposition(cs: ConstraintSystem, name: str, value_lc: dict, bit_wires):
    """constrain_decomposition + the Num2Bits_strict alias check."""
    constrain_decomposition(cs, value_lc, bit_wires)
    strict_bits_cs(cs, name, bit_wires)


# ---------------------------------------------------------------------------
# Poseidon (t-lane permutation; blocks: x2/x4/x5 per phase)
# ---------------------------------------------------------------------------


def poseidon_cs(cs: ConstraintSystem, name: str, input_lcs: list[dict]) -> dict:
    """Emit Poseidon(len(input_lcs)) constraints. Returns the output LC
    (state[0] after the last round). Allocates blocks:
      {name}_x2, {name}_x4, {name}_x5  — shape (total_sbox_count,)
    in round-major, lane-minor order (full rounds use t lanes, partial 1)."""
    t = len(input_lcs) + 1
    rp = ROUNDS_P[t - 2]
    c = round_constants(t)
    m = mds_matrix(t)
    n_rounds = ROUNDS_F + rp
    half = ROUNDS_F // 2
    sbox_counts = [t if (r < half or r >= half + rp) else 1 for r in range(n_rounds)]
    total = sum(sbox_counts)
    x2 = cs.alloc_block(f"{name}_x2", (total,))
    x4 = cs.alloc_block(f"{name}_x4", (total,))
    x5 = cs.alloc_block(f"{name}_x5", (total,))

    state = [lc_const(0)] + list(input_lcs)
    idx = 0
    for r in range(n_rounds):
        state = [lc_add(state[i], lc_const(c[r * t + i])) for i in range(t)]
        n_sbox = sbox_counts[r]
        for i in range(n_sbox):
            s_in = state[i]
            mul_lc(cs, int(x2[idx]), s_in, s_in)
            mul_lc(cs, int(x4[idx]), lc_wire(x2[idx]), lc_wire(x2[idx]))
            mul_lc(cs, int(x5[idx]), lc_wire(x4[idx]), s_in)
            state[i] = lc_wire(x5[idx])
            idx += 1
        state = [
            lc_add(*[lc_scale(state[j], m[i][j]) for j in range(t)]) for i in range(t)
        ]
    assert idx == total
    return state[0]


# ---------------------------------------------------------------------------
# vectorized bit-LC machinery for keccak
# ---------------------------------------------------------------------------
#
# Inside a keccak permutation every bit LC is affine in at most one wire:
# c0 + s*w with c0 in {0,1}, s in {+1,-1} (plain wires, iota complements).
# _Bits holds arrays of those triples; term *groups* are (rel_rows, wires,
# coeff) chunks fed straight to ConstraintSystem.add_bulk. The only general
# case — multi-term input LCs on the first absorbed block (e.g. the PoB
# commitment keccak whose message bits are digest-select sums) — goes through
# the dict-based fallback (_DictBits), which costs Python iteration only for
# round 0 of that one permutation.


class _Bits:
    """Affine one-wire bit LCs as arrays: value = c0 + s*w (w = -1: no wire)."""

    __slots__ = ("c0", "w", "s")

    def __init__(self, c0, w, s):
        self.c0 = np.asarray(c0, np.int64)
        self.w = np.asarray(w, np.int64)
        self.s = np.asarray(s, np.int64)

    @staticmethod
    def from_wires(w):
        w = np.asarray(w, np.int64)
        return _Bits(np.zeros_like(w), w, np.ones_like(w))

    def take(self, l0: int, l1: int):
        return _Bits(self.c0[l0:l1], self.w[l0:l1], self.s[l0:l1])

    def gather(self, lane_idx, z_idx):
        return _Bits(self.c0[lane_idx, z_idx], self.w[lane_idx, z_idx], self.s[lane_idx, z_idx])

    def groups(self, scale: int = 1):
        """Term groups over row-major flattened elements."""
        c0 = self.c0.reshape(-1)
        w = self.w.reshape(-1)
        s = self.s.reshape(-1)
        rows = np.arange(len(c0))
        out = []
        pos = (w >= 0) & (s == 1)
        neg = (w >= 0) & (s == -1)
        if pos.any():
            out.append((rows[pos], w[pos], scale % FR_MOD))
        if neg.any():
            out.append((rows[neg], w[neg], (-scale) % FR_MOD))
        cm = c0 != 0
        if cm.any():
            # c0 is 0/1 in keccak; general c0 handled via per-element list
            if ((c0 == 0) | (c0 == 1)).all():
                out.append((rows[cm], np.zeros(cm.sum(), np.int64), scale % FR_MOD))
            else:
                out.append((rows[cm], np.zeros(cm.sum(), np.int64),
                            [int(c) * scale % FR_MOD for c in c0[cm]]))
        return out

    def complement_where(self, mask):
        """1 - x on masked elements (iota)."""
        mask = np.asarray(mask, bool)
        c0 = np.where(mask, 1 - self.c0, self.c0)
        s = np.where(mask, -self.s, self.s)
        return _Bits(c0, self.w, s)

    def to_lcs(self):
        """Nested [25][64] (or flat) dict-LC view for callers outside keccak."""
        c0 = self.c0
        w = self.w
        s = self.s
        if c0.ndim == 2:
            return [
                [_affine_lc(int(c0[l, z]), int(w[l, z]), int(s[l, z])) for z in range(c0.shape[1])]
                for l in range(c0.shape[0])
            ]
        return [_affine_lc(int(c), int(ww), int(ss)) for c, ww, ss in zip(c0, w, s)]


def _affine_lc(c0: int, w: int, s: int) -> dict:
    lc = lc_const(c0)
    if w >= 0:
        lc = lc_add(lc, lc_wire(w, s))
    return lc


class _DictBits:
    """General dict-LC fallback with the same slicing/group API as _Bits
    (2D only: [25][64] lists of dicts)."""

    __slots__ = ("lcs",)

    def __init__(self, lcs):
        self.lcs = lcs  # list of lists of dicts

    def take(self, l0: int, l1: int):
        return _DictBits(self.lcs[l0:l1])

    def gather(self, lane_idx, z_idx):
        li = np.asarray(lane_idx)
        zi = np.asarray(z_idx)
        return _DictBits(
            [
                [self.lcs[int(li[i, j])][int(zi[i, j])] for j in range(li.shape[1])]
                for i in range(li.shape[0])
            ]
        )

    def groups(self, scale: int = 1):
        rows, wires, coeffs = [], [], []
        i = 0
        for row in self.lcs:
            for lc in row:
                for w, c in lc.items():
                    rows.append(i)
                    wires.append(w)
                    coeffs.append(c * scale % FR_MOD)
                i += 1
        return [(np.asarray(rows, np.int64), np.asarray(wires, np.int64), coeffs)]


def _as_bits(state):
    """Nested dict-LC state -> _Bits when affine, else _DictBits."""
    if isinstance(state, (_Bits, _DictBits)):
        return state
    nl = len(state)
    nz = len(state[0])
    c0 = np.zeros((nl, nz), np.int64)
    w = np.full((nl, nz), -1, np.int64)
    s = np.ones((nl, nz), np.int64)
    for l in range(nl):
        for z in range(nz):
            lc = state[l][z]
            items = [(k, v) for k, v in lc.items() if v]
            const = 0
            wire = -1
            sign = 1
            ok = True
            for k, v in items:
                if k == 0:
                    const = v
                elif wire == -1:
                    wire = k
                    if v == 1:
                        sign = 1
                    elif v == FR_MOD - 1:
                        sign = -1
                    else:
                        ok = False
                else:
                    ok = False
            if not ok or const not in (0, 1):
                return _DictBits(state)
            c0[l, z] = const
            w[l, z] = wire
            s[l, z] = sign
    return _Bits(c0, w, s)


def _scale_groups(groups, k: int):
    out = []
    for rows, wires, coeffs in groups:
        if isinstance(coeffs, (int, np.integer)):
            out.append((rows, wires, int(coeffs) * k % FR_MOD))
        elif isinstance(coeffs, np.ndarray) and coeffs.dtype != object:
            out.append((rows, wires, [int(c) * k % FR_MOD for c in coeffs]))
        else:
            out.append((rows, wires, [int(c) * k % FR_MOD for c in coeffs]))
    return out


def _wire_groups(w, scale: int = 1):
    w = np.asarray(w, np.int64).reshape(-1)
    return [(np.arange(len(w)), w, scale % FR_MOD)]


def emit_xor(cs: ConstraintSystem, out_wires, a_groups, b_groups):
    """Bulk out = a XOR b (boolean operands): a*b = (a + b - out)/2."""
    out_w = np.asarray(out_wires, np.int64).reshape(-1)
    n = len(out_w)
    c = _scale_groups(a_groups, INV2) + _scale_groups(b_groups, INV2)
    c.append((np.arange(n), out_w, (FR_MOD - INV2)))
    cs.add_bulk(n, a=a_groups, b=b_groups, c=c)


def emit_and_not(cs: ConstraintSystem, out_wires, b_groups, c_groups):
    """Bulk out = (1 - b) AND c."""
    out_w = np.asarray(out_wires, np.int64).reshape(-1)
    n = len(out_w)
    a = [(np.arange(n), np.zeros(n, np.int64), 1)] + _scale_groups(b_groups, _NEG1)
    cs.add_bulk(n, a=a, b=c_groups, c=[(np.arange(n), out_w, 1)])


# ---------------------------------------------------------------------------
# Keccak-f[1600] (blocks per permutation: theta xor chains, d, theta_out,
# chi_and, chi_out — bit wires in (round, plane, lane, bit) order)
# ---------------------------------------------------------------------------

# rho+pi gather tables: b[l][z] = to[_SRC[l]][(z - _ROT[l]) % 64]
_Z = np.arange(64)
_RP_LANE = np.repeat(np.asarray(_SRC, np.int64), 64).reshape(25, 64)
_RP_Z = (np.arange(64)[None, :] - np.asarray(_ROT, np.int64)[:, None]) % 64
_CHI1_LANE = _RP_LANE[np.asarray(_CHI1, np.int64)]
_CHI1_Z = _RP_Z[np.asarray(_CHI1, np.int64)]
_CHI2_LANE = _RP_LANE[np.asarray(_CHI2, np.int64)]
_CHI2_Z = _RP_Z[np.asarray(_CHI2, np.int64)]
# theta d: d[x][z] = c[(x-1)%5][z] ^ c[(x+1)%5][(z-1)%64]
_D_XA = np.repeat((np.arange(5) - 1) % 5, 64).reshape(5, 64)
_D_ZA = np.broadcast_to(_Z, (5, 64))
_D_XB = np.repeat((np.arange(5) + 1) % 5, 64).reshape(5, 64)
_D_ZB = np.broadcast_to((_Z - 1) % 64, (5, 64))
# to: b side gathers d[l % 5][z]
_TO_X = np.repeat(np.arange(25) % 5, 64).reshape(25, 64)
_TO_Z = np.broadcast_to(_Z, (25, 64))


def keccak_f_cs(cs: ConstraintSystem, name: str, state_lcs):
    """Emit the 24-round permutation over a 25x64 array of bit LCs
    (state_lcs[lane][z], LSB-first bits of lane x+5y) — accepts nested dict
    LCs or a _Bits array state; returns the output state as _Bits.
    Block shapes (identical to the witness twin keccak_f_trace):
      {name}_tc    (24, 4, 5, 64)  theta xor-chain partials
      {name}_d     (24, 5, 64)
      {name}_to    (24, 25, 64)    theta output
      {name}_ca    (24, 25, 64)    chi AND term
      {name}_co    (24, 25, 64)    chi output (pre-iota)
    Internal wires carry no boolean constraints: every one is the XOR/AND of
    boolean operands and therefore boolean by construction."""
    tc = cs.alloc_block(f"{name}_tc", (24, 4, 5, 64), width=1)
    dd = cs.alloc_block(f"{name}_d", (24, 5, 64), width=1)
    to = cs.alloc_block(f"{name}_to", (24, 25, 64), width=1)
    ca = cs.alloc_block(f"{name}_ca", (24, 25, 64), width=1)
    co = cs.alloc_block(f"{name}_co", (24, 25, 64), width=1)

    s = _as_bits(state_lcs)
    for r in range(24):
        # theta chains: tc[step][x] = (step == 0 ? s[x] : tc[step-1][x]) ^ s[x+5(step+1)]
        for step in range(4):
            a_g = s.take(0, 5).groups() if step == 0 else _wire_groups(tc[r, step - 1])
            b_g = s.take(5 * (step + 1), 5 * (step + 2)).groups()
            emit_xor(cs, tc[r, step], a_g, b_g)
        c_bits = _Bits.from_wires(tc[r, 3])  # (5, 64) column parities
        # d[x][z] = c[x-1][z] ^ c[x+1][(z-1) % 64]
        emit_xor(
            cs, dd[r],
            c_bits.gather(_D_XA, _D_ZA).groups(),
            c_bits.gather(_D_XB, _D_ZB).groups(),
        )
        d_bits = _Bits.from_wires(dd[r])
        # theta out: to[l][z] = s[l][z] ^ d[l%5][z]
        emit_xor(cs, to[r], s.groups(), d_bits.gather(_TO_X, _TO_Z).groups())
        to_bits = _Bits.from_wires(to[r])
        # rho+pi is pure rewiring (gathers); chi: ca = ~b1 & b2, co = b ^ ca
        emit_and_not(
            cs, ca[r],
            to_bits.gather(_CHI1_LANE, _CHI1_Z).groups(),
            to_bits.gather(_CHI2_LANE, _CHI2_Z).groups(),
        )
        emit_xor(
            cs, co[r],
            to_bits.gather(_RP_LANE, _RP_Z).groups(),
            _wire_groups(ca[r]),
        )
        # iota: complement lane-0 bits where the round constant has a 1
        rc_mask = np.zeros((25, 64), bool)
        rc_mask[0] = [(_RC[r] >> z) & 1 == 1 for z in range(64)]
        s = _Bits.from_wires(co[r]).complement_where(rc_mask)
    return s


def keccak_absorb_xor_cs(cs: ConstraintSystem, name: str, state, block_bits):
    """XOR a 17x64 message-bit block into a _Bits state; returns new _Bits
    state (lanes 17-24 pass through). block_bits: _Bits/_DictBits (17, 64)."""
    ax = cs.alloc_block(name, (17, 64), width=1)
    emit_xor(cs, ax, state.take(0, 17).groups(), block_bits.groups())
    out = _Bits.from_wires(np.concatenate([np.asarray(ax, np.int64).reshape(17, 64),
                                           np.zeros((8, 64), np.int64)], axis=0))
    # lanes 17-24 keep the previous state's (c0, w, s)
    c0 = out.c0.copy()
    w = out.w.copy()
    sg = out.s.copy()
    if isinstance(state, _Bits):
        c0[17:] = state.c0[17:]
        w[17:] = state.w[17:]
        sg[17:] = state.s[17:]
        return _Bits(c0, w, sg)
    # dict-state fallback: keep dict lanes (only possible pre-first-absorb,
    # where capacity lanes are the constant 0)
    lcs = _Bits(c0, w, sg).to_lcs()
    for l in range(17, 25):
        lcs[l] = state.lcs[l]
    return _DictBits(lcs)


def _bits_from_lc_list(lcs_17x64):
    """[17][64] dict LCs -> _Bits or _DictBits padded to (25, 64) with 0."""
    full = [row for row in lcs_17x64] + [[lc_const(0)] * 64 for _ in range(8)]
    return _as_bits(full)


def keccak_bytes_cs(cs: ConstraintSystem, name: str, byte_lcs: list, in_len_lc: dict,
                    max_blocks: int):
    """Dynamic-length KeccakBytes (keccak.circom:454-489): pad per the
    reference's semantics (Pad, :412-446) with one-hot selections instead of
    IsEqual chains, absorb all max_blocks blocks, select the digest after
    numBlocks (Final's compute-all-then-select, :330-349).

    byte_lcs: max_blocks*136 byte LCs (values range-checked by the padded-bit
    decomposition below, mirroring the circuit's own Num2Bits(8)).
    Returns 256 digest-bit LCs. Implicitly asserts in_len < max_bytes and
    numBlocks <= max_blocks (one-hot satisfiability).

    Block allocation order (the witness twin must match):
      {name}_div (1,), {name}_rem_bits (8,), {name}_rem_hi_bits (8,),
      {name}_len_oh (max_bytes,), {name}_blk_oh (max_blocks,),
      {name}_filter (max_bytes,), {name}_padded (max_bytes,),
      {name}_pbits (max_bytes, 8),
      per block b: {name}_b{b}_ax (17, 64) absorb xors (b > 0 only),
                   keccak_f_cs blocks for {name}_b{b},
      {name}_sel (max_blocks, 256) digest-select partial products.
    """
    max_bytes = max_blocks * 136
    assert len(byte_lcs) == max_bytes

    # numBlocks = inLen \ 136 + 1 (Divide, divide.circom:17-33)
    div = cs.alloc_block(f"{name}_div", (1,))
    div_lc = lc_wire(int(div[0]))
    rem_bits = cs.alloc_block(f"{name}_rem_bits", (8,), width=1)
    rem_lc = bits_lc(rem_bits)
    constrain_boolean(cs, rem_bits)
    # rem < 136: decompose 135 - rem into 8 bits
    rem_hi = cs.alloc_block(f"{name}_rem_hi_bits", (8,), width=1)
    constrain_decomposition(cs, lc_sub(lc_const(135), rem_lc), rem_hi)
    # inLen = div*136 + rem
    constrain_linear_zero(
        cs, lc_sub(in_len_lc, lc_add(lc_scale(div_lc, 136), rem_lc))
    )
    # one-hot over byte positions (also asserts inLen < max_bytes)
    len_oh = one_hot_cs(cs, f"{name}_len_oh", max_bytes, in_len_lc)
    # one-hot over blocks (also asserts numBlocks <= max_blocks)
    blk_oh = one_hot_cs(cs, f"{name}_blk_oh", max_blocks, div_lc)
    filt = prefix_filter_cs(cs, f"{name}_filter", len_oh)

    # padded[i] = in[i]*filter[i] + 0x01*len_oh[i] + 0x80*blk_oh[i/136]@block-end
    padded = cs.alloc_block(f"{name}_padded", (max_bytes,), width=8)
    rows = np.arange(max_bytes)
    in_groups = _DictBits([byte_lcs]).groups()  # single row of max_bytes LCs
    last_rows = rows[rows % 136 == 135]
    c_groups = [
        (rows, np.asarray(padded, np.int64), 1),
        (rows, np.asarray(len_oh, np.int64), _NEG1),  # -0x01 * len_oh[i]
        (last_rows, np.asarray(blk_oh[last_rows // 136], np.int64),
         (-0x80) % FR_MOD),
    ]
    cs.add_bulk(max_bytes, a=in_groups,
                b=[(rows, np.asarray(filt, np.int64), 1)], c=c_groups)

    # byte range-check: padded = sum 2^k pbits, pbits boolean (Num2Bits(8))
    pbits = cs.alloc_block(f"{name}_pbits", (max_bytes, 8), width=1)
    constrain_boolean(cs, pbits)
    a_groups = [(rows, np.asarray(pbits[:, k], np.int64), 1 << k) for k in range(8)]
    a_groups.append((rows, np.asarray(padded, np.int64), _NEG1))
    cs.add_bulk(max_bytes, a=a_groups, b=[(rows, np.zeros(max_bytes, np.int64), 1)])

    def block_bits(b):
        """(17, 64) _Bits of message block b (bit z of lane l = byte bit)."""
        w = np.asarray(
            [[pbits[b * 136 + l * 8 + z // 8, z % 8] for z in range(64)]
             for l in range(17)],
            np.int64,
        )
        return _Bits.from_wires(w)

    digest_states = []  # per block: _Bits (squeeze region read below)
    state = None
    for b in range(max_blocks):
        if b == 0:
            w = np.full((25, 64), -1, np.int64)
            blk = block_bits(0)
            w[:17] = blk.w
            state = _Bits(np.zeros((25, 64), np.int64), w, np.ones((25, 64), np.int64))
        else:
            state = keccak_absorb_xor_cs(cs, f"{name}_b{b}_ax", state, block_bits(b))
        state = keccak_f_cs(cs, f"{name}_b{b}", state)
        digest_states.append(state)

    # digest select: out_bit = sum_b blk_oh[b] * state_b[bit]
    sel = cs.alloc_block(f"{name}_sel", (max_blocks, 256), width=1)
    n = max_blocks * 256
    rows = np.arange(n)
    a_g = [(rows, np.repeat(np.asarray(blk_oh, np.int64), 256), 1)]
    # b side: per block, the 256 digest bits (lanes 0-3) — concatenate groups
    b_g = []
    for b in range(max_blocks):
        for rr, ww, cc in digest_states[b].take(0, 4).groups():
            b_g.append((rr + b * 256, ww, cc))
    cs.add_bulk(n, a=a_g, b=b_g, c=[(rows, np.asarray(sel, np.int64).reshape(-1), 1)])
    out_bits = [
        lc_add(*[lc_wire(int(sel[b, bit])) for b in range(max_blocks)])
        for bit in range(256)
    ]
    return out_bits


def keccak_static_cs(cs: ConstraintSystem, name: str, msg_bit_lcs, n_blocks: int):
    """Static-length keccak over n_blocks*1088 message-bit LCs (padding bits
    already included as constants). Returns 256 digest-bit LCs.
    Blocks: per block b>0 '{name}_b{b}_ax' (17, 64), plus keccak_f blocks."""
    assert len(msg_bit_lcs) == n_blocks * 1088
    state = None
    for b in range(n_blocks):
        blk = _bits_from_lc_list(
            [
                [msg_bit_lcs[b * 1088 + l * 64 + z] for z in range(64)]
                for l in range(17)
            ]
        )
        blk17 = blk.take(0, 17)
        if b == 0:
            state = blk  # capacity lanes are constant 0 already
        else:
            state = keccak_absorb_xor_cs(cs, f"{name}_b{b}_ax", state, blk17)
        state = keccak_f_cs(cs, f"{name}_b{b}", state)
    sq = state.take(0, 4).to_lcs()
    return [sq[bit // 64][bit % 64] for bit in range(256)]


def digest_bits_to_byte_lcs(out_bits):
    """256 digest-bit LCs -> 32 byte LCs (LSB-first bits per byte)."""
    return [
        lc_add(*[lc_scale(out_bits[8 * j + k], 1 << k) for k in range(8)])
        for j in range(32)
    ]
