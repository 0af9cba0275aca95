"""Constraint-side gadget encodings shared by circuits: booleans, XOR chains,
bit decompositions, Poseidon rounds, Keccak-f rounds.

Every function here has a *witness-side twin* in pob_tpu.r1cs.witness that
produces the exact block tensors (same names, same order) on device; the
contract is enforced by ConstraintSystem.check_witness in tests."""

from __future__ import annotations

import numpy as np

from ..field.ref import FR_MOD
from ..hash.poseidon_params import ROUNDS_F, ROUNDS_P, mds_matrix, round_constants
from .builder import ConstraintSystem
from .lc import INV2, lc_add, lc_const, lc_scale, lc_sub, lc_terms, lc_wire

# Keccak tables (shared with the device kernel pob_tpu/hash/keccak.py)
from ..hash.keccak import _SRC, _ROT, _RC, _CHI1, _CHI2  # noqa: F401


def constrain_boolean(cs: ConstraintSystem, wires):
    """b * (b - 1) = 0 for each wire in the array."""
    for w in np.asarray(wires).reshape(-1):
        cs.add([(int(w), 1)], [(int(w), 1)], [(int(w), 1)])


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

    NOTE: for widths >= 254 this does not add circom's Num2Bits_strict alias
    check (unique canonical decomposition); witness generation always emits
    canonical bits. TODO(round 2): CompConstant-style alias constraint."""
    constrain_boolean(cs, bit_wires)
    constrain_linear_zero(cs, lc_sub(bits_lc(bit_wires), value_lc))


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
# Keccak-f[1600] (blocks per permutation: theta xor chains, d, theta_out,
# chi_and, chi_out — bit wires in (round, plane, lane, bit) order)
# ---------------------------------------------------------------------------


def keccak_f_cs(cs: ConstraintSystem, name: str, state_lcs):
    """Emit the 24-round permutation over a 25x64 array of bit LCs
    (state_lcs[lane][z], LSB-first bits of lane x+5y). Returns the output bit
    LC array. Block shapes:
      {name}_tc    (24, 4, 5, 64)  theta xor-chain partials
      {name}_d     (24, 5, 64)
      {name}_to    (24, 25, 64)    theta output
      {name}_ca    (24, 25, 64)    chi AND term
      {name}_co    (24, 25, 64)    chi output (pre-iota)
    """
    tc = cs.alloc_block(f"{name}_tc", (24, 4, 5, 64))
    dd = cs.alloc_block(f"{name}_d", (24, 5, 64))
    to = cs.alloc_block(f"{name}_to", (24, 25, 64))
    ca = cs.alloc_block(f"{name}_ca", (24, 25, 64))
    co = cs.alloc_block(f"{name}_co", (24, 25, 64))
    constrain_boolean(cs, tc)
    constrain_boolean(cs, dd)
    constrain_boolean(cs, to)
    constrain_boolean(cs, ca)
    constrain_boolean(cs, co)

    s = [[state_lcs[l][z] for z in range(64)] for l in range(25)]
    for r in range(24):
        # theta: chain partial xors p1=s[x]^s[x+5], p2=p1^s[x+10], ...
        c_lc = [[None] * 64 for _ in range(5)]
        for x in range(5):
            prev = s[x]
            for step in range(4):
                for z in range(64):
                    w = int(tc[r, step, x, z])
                    xor_lc(cs, w, prev[z], s[x + 5 * (step + 1)][z])
                prev = [lc_wire(int(tc[r, step, x, z])) for z in range(64)]
            c_lc[x] = prev
        d_lc = [[None] * 64 for _ in range(5)]
        for x in range(5):
            for z in range(64):
                w = int(dd[r, x, z])
                # d[x][z] = c[x-1][z] ^ c[x+1][(z-1) % 64]  (rotl by 1)
                xor_lc(cs, w, c_lc[(x - 1) % 5][z], c_lc[(x + 1) % 5][(z - 1) % 64])
            d_lc[x] = [lc_wire(int(dd[r, x, z])) for z in range(64)]
        t_lc = [[None] * 64 for _ in range(25)]
        for l in range(25):
            for z in range(64):
                w = int(to[r, l, z])
                xor_lc(cs, w, s[l][z], d_lc[l % 5][z])
            t_lc[l] = [lc_wire(int(to[r, l, z])) for z in range(64)]
        # rho + pi: pure rewiring. out lane l gets in lane _SRC[l] rotated left
        # by _ROT[l]: b[l][z] = t[src][(z - rot) % 64]
        b_lc = [
            [t_lc[int(_SRC[l])][(z - int(_ROT[l])) % 64] for z in range(64)]
            for l in range(25)
        ]
        # chi
        new_s = [[None] * 64 for _ in range(25)]
        for l in range(25):
            for z in range(64):
                wa = int(ca[r, l, z])
                and_not_lc(cs, wa, b_lc[int(_CHI1[l])][z], b_lc[int(_CHI2[l])][z])
                wo = int(co[r, l, z])
                xor_lc(cs, wo, b_lc[l][z], lc_wire(wa))
                new_s[l][z] = lc_wire(wo)
        # iota: xor lane 0 with the round constant — linear (const flip)
        rc = _RC[r]
        for z in range(64):
            if (rc >> z) & 1:
                new_s[0][z] = lc_sub(lc_const(1), new_s[0][z])
        s = new_s
    return s
