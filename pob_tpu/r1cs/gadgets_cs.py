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


def one_hot_cs(cs: ConstraintSystem, name: str, n: int, index_lc: dict):
    """One-hot selection vector: oh[i] in {0,1}, sum oh = 1, sum i*oh = index.

    Replaces circom's IsEqual-per-position pattern (selector.circom:21-46,
    Filter, Pad) without inverse hints; unsatisfiable when index is outside
    [0, n) — the same rejection circom's `sumIsEq === 1` provides."""
    oh = cs.alloc_block(name, (n,))
    constrain_boolean(cs, oh)
    total = lc_add(*[lc_wire(int(w)) for w in oh])
    constrain_linear_zero(cs, lc_sub(total, lc_const(1)))
    weighted = lc_add(*[lc_wire(int(oh[i]), i) for i in range(1, n)])
    constrain_linear_zero(cs, lc_sub(weighted, index_lc))
    return oh


def prefix_filter_cs(cs: ConstraintSystem, name: str, oh):
    """filter[i] = 1 iff i < index, given oh = one_hot(index) (Filter,
    array.circom:26-40). Linear chain of wires."""
    n = len(oh)
    f = cs.alloc_block(name, (n,))
    # f[0] = 1 - oh[0]; f[i] = f[i-1] - oh[i]
    constrain_linear_zero(
        cs, lc_sub(lc_wire(int(f[0])), lc_sub(lc_const(1), lc_wire(int(oh[0]))))
    )
    for i in range(1, n):
        constrain_linear_zero(
            cs,
            lc_sub(lc_wire(int(f[i])), lc_sub(lc_wire(int(f[i - 1])), lc_wire(int(oh[i])))),
        )
    return f


def is_zero_cs(cs: ConstraintSystem, name: str, x_lcs: list):
    """IsZero for a list of LCs; allocates inverse-hint wires (the analog of
    circom's only non-deterministic hint besides Divide). Returns out wires.
    out = 1 - x*inv and x*out = 0."""
    n = len(x_lcs)
    inv = cs.alloc_block(f"{name}_inv", (n,))
    out = cs.alloc_block(f"{name}_out", (n,))
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
    bits = cs.alloc_block(name, (k + 1,))
    val = lc_add(a_lc, lc_const(1 << k), lc_scale(b_lc, FR_MOD - 1))
    constrain_decomposition(cs, val, bits)
    return lc_sub(lc_const(1), lc_wire(int(bits[k])))


def mult_and_cs(cs: ConstraintSystem, name: str, bit_lcs: list):
    """AND of boolean LCs via a product chain; returns the output LC."""
    if len(bit_lcs) == 1:
        return bit_lcs[0]
    acc_w = cs.alloc_block(name, (len(bit_lcs) - 1,))
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


def keccak_bytes_cs(cs: ConstraintSystem, name: str, byte_lcs: list, in_len_lc: dict,
                    max_blocks: int):
    """Dynamic-length KeccakBytes (keccak.circom:454-489): pad per the
    reference's semantics (Pad, :412-446) with one-hot selections instead of
    IsEqual chains, absorb all max_blocks blocks, select the digest after
    numBlocks (Final's compute-all-then-select, :330-349).

    byte_lcs: max_blocks*136 byte LCs (values must be range-checked by the
    padded-bit decomposition below, mirroring the circuit's own Num2Bits(8)).
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
    rem_bits = cs.alloc_block(f"{name}_rem_bits", (8,))
    rem_lc = bits_lc(rem_bits)
    constrain_boolean(cs, rem_bits)
    # rem < 136: decompose 135 - rem into 8 bits
    rem_hi = cs.alloc_block(f"{name}_rem_hi_bits", (8,))
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

    padded = cs.alloc_block(f"{name}_padded", (max_bytes,))
    for i in range(max_bytes):
        # padded[i] = in[i]*filter[i] + 0x01*isEq[i] + 0x80*isLast[i]
        is_last = lc_wire(int(blk_oh[i // 136])) if (i % 136) == 135 else lc_const(0)
        rhs = lc_sub(
            lc_wire(int(padded[i])),
            lc_add(lc_scale(lc_wire(int(len_oh[i])), 0x01), lc_scale(is_last, 0x80)),
        )
        cs.add(lc_terms(byte_lcs[i]), [(int(filt[i]), 1)], lc_terms(rhs))

    pbits = cs.alloc_block(f"{name}_pbits", (max_bytes, 8))
    constrain_boolean(cs, pbits)
    for i in range(max_bytes):
        constrain_linear_zero(
            cs, lc_sub(bits_lc(pbits[i]), lc_wire(int(padded[i])))
        )

    def block_bit(b, l, z):
        if l >= 17:
            return lc_const(0)
        byte = b * 136 + l * 8 + z // 8
        return lc_wire(int(pbits[byte, z % 8]))

    digest_states = []  # per block: 4 lanes x 64 bit LCs (the squeeze region)
    state = None
    for b in range(max_blocks):
        if b == 0:
            in_lcs = [[block_bit(0, l, z) for z in range(64)] for l in range(25)]
        else:
            ax = cs.alloc_block(f"{name}_b{b}_ax", (17, 64))
            constrain_boolean(cs, ax)
            for l in range(17):
                for z in range(64):
                    xor_lc(cs, int(ax[l, z]), state[l][z], block_bit(b, l, z))
            in_lcs = [
                [lc_wire(int(ax[l, z])) for z in range(64)] if l < 17 else state[l]
                for l in range(25)
            ]
        state = keccak_f_cs(cs, f"{name}_b{b}", in_lcs)
        digest_states.append(state)

    # digest select: out_bit = sum_b blk_oh[b] * state_b[bit]
    sel = cs.alloc_block(f"{name}_sel", (max_blocks, 256))
    out_bits = []
    for bit in range(256):
        l, z = bit // 64, bit % 64
        parts = []
        for b in range(max_blocks):
            cs.add(
                [(int(blk_oh[b]), 1)],
                lc_terms(digest_states[b][l][z]),
                [(int(sel[b, bit]), 1)],
            )
            parts.append(lc_wire(int(sel[b, bit])))
        out_bits.append(lc_add(*parts))
    return out_bits


def digest_bits_to_byte_lcs(out_bits):
    """256 digest-bit LCs -> 32 byte LCs (LSB-first bits per byte)."""
    return [
        lc_add(*[lc_scale(out_bits[8 * j + k], 1 << k) for k in range(8)])
        for j in range(32)
    ]
