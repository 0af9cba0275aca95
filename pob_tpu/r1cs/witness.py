"""Witness-side twins of the constraint gadgets: device (JAX) trace functions
that recompute each permutation while exporting every intermediate wire block
in the exact order the constraint builders allocate them.

This is the framework's witness generator for the proving path — the role of
the reference's circom-generated C++ runtime (SURVEY.md §2.8) — but batched:
one proof instance per leading batch lane, every tensor static-shape."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD
from ..hash import keccak as kdev
from ..hash.keccak import _CHI1, _CHI2, _RC_HI, _RC_LO, _ROT, _SRC, _rotl64
from ..hash.poseidon import _mont_consts
from ..hash.poseidon_params import ROUNDS_F, ROUNDS_P

U32 = jnp.uint32
I32 = jnp.int32


def lane_bits(lo, hi):
    """(..., L) u32 pairs -> (..., L, 64) int32 bits, LSB first."""
    shifts = np.arange(32, dtype=np.uint32)
    b_lo = ((lo[..., None] >> shifts) & 1).astype(I32)
    b_hi = ((hi[..., None] >> shifts) & 1).astype(I32)
    return jnp.concatenate([b_lo, b_hi], axis=-1)


def keccak_f_trace(lo, hi):
    """Run keccak-f while exporting the constraint wire blocks.

    Returns (blocks, (lo_out, hi_out)) where blocks is a dict:
      tc (..., 24, 4, 5, 64), d (..., 24, 5, 64), to/ca/co (..., 24, 25, 64)
    — bit tensors matching gadgets_cs.keccak_f_cs allocation order."""
    tcs, ds, tos, cas, cos = [], [], [], [], []
    for r in range(24):
        # theta chains
        tc_lo, tc_hi = [], []
        c_lo, c_hi = [], []
        for x in range(5):
            p_lo, p_hi = lo[..., x], hi[..., x]
            steps_lo, steps_hi = [], []
            for k in range(4):
                p_lo = p_lo ^ lo[..., x + 5 * (k + 1)]
                p_hi = p_hi ^ hi[..., x + 5 * (k + 1)]
                steps_lo.append(p_lo)
                steps_hi.append(p_hi)
            tc_lo.append(jnp.stack(steps_lo, axis=-1))  # (..., 4)
            tc_hi.append(jnp.stack(steps_hi, axis=-1))
            c_lo.append(p_lo)
            c_hi.append(p_hi)
        tc_lo = jnp.stack(tc_lo, axis=-1)  # (..., 4, 5)
        tc_hi = jnp.stack(tc_hi, axis=-1)
        c_lo = jnp.stack(c_lo, axis=-1)  # (..., 5)
        c_hi = jnp.stack(c_hi, axis=-1)
        rot_lo, rot_hi = _rotl64(jnp.roll(c_lo, -1, -1), jnp.roll(c_hi, -1, -1), 1)
        d_lo = jnp.roll(c_lo, 1, -1) ^ rot_lo
        d_hi = jnp.roll(c_hi, 1, -1) ^ rot_hi
        t_lo = lo ^ jnp.tile(d_lo, (1,) * (d_lo.ndim - 1) + (5,))
        t_hi = hi ^ jnp.tile(d_hi, (1,) * (d_hi.ndim - 1) + (5,))
        b_lo, b_hi = _rotl64(t_lo[..., _SRC], t_hi[..., _SRC], _ROT)
        a_lo = ~b_lo[..., _CHI1] & b_lo[..., _CHI2]
        a_hi = ~b_hi[..., _CHI1] & b_hi[..., _CHI2]
        o_lo = b_lo ^ a_lo
        o_hi = b_hi ^ a_hi
        tcs.append(lane_bits(tc_lo, tc_hi))
        ds.append(lane_bits(d_lo, d_hi))
        tos.append(lane_bits(t_lo, t_hi))
        cas.append(lane_bits(a_lo, a_hi))
        cos.append(lane_bits(o_lo, o_hi))
        lo = o_lo.at[..., 0].set(o_lo[..., 0] ^ _RC_LO[r])
        hi = o_hi.at[..., 0].set(o_hi[..., 0] ^ _RC_HI[r])
    blocks = {
        "tc": jnp.stack(tcs, axis=-4),
        "d": jnp.stack(ds, axis=-3),
        "to": jnp.stack(tos, axis=-3),
        "ca": jnp.stack(cas, axis=-3),
        "co": jnp.stack(cos, axis=-3),
    }
    return blocks, (lo, hi)


def poseidon_trace(input_limbs):
    """Poseidon over (..., n, 16) canonical limb inputs, exporting the s-box
    intermediates. Returns (blocks, out_limbs) with blocks x2/x4/x5 of shape
    (..., total_sbox, 16) canonical limbs, matching gadgets_cs.poseidon_cs."""
    t = input_limbs.shape[-2] + 1
    rp = ROUNDS_P[t - 2]
    half = ROUNDS_F // 2
    c_mont, m_np = _mont_consts(t)
    m_mont = jnp.asarray(m_np)

    state = limb.to_mont(FR, input_limbs)
    zero = jnp.zeros(state.shape[:-2] + (1, limb.L), U32)
    state = jnp.concatenate([zero, state], axis=-2)

    def mix(s):
        prod = limb.mont_mul(FR, m_mont, s[..., None, :, :])
        acc = prod[..., 0, :]
        for j in range(1, t):
            acc = limb.add(FR, acc, prod[..., j, :])
        return acc

    def sigma_trace(x):
        x2 = limb.mont_sqr(FR, x)
        x4 = limb.mont_sqr(FR, x2)
        x5 = limb.mont_mul(FR, x4, x)
        return x2, x4, x5

    def full_round(s, c_r):
        s = limb.add(FR, s, c_r)
        x2, x4, x5 = sigma_trace(s)
        return mix(x5), (x2, x4, x5)

    def partial_round(s, c_r):
        s = limb.add(FR, s, c_r)
        x2, x4, x5 = sigma_trace(s[..., 0:1, :])
        s = jnp.concatenate([x5, s[..., 1:, :]], axis=-2)
        return mix(s), (x2[..., 0, :], x4[..., 0, :], x5[..., 0, :])

    state, tr1 = jax.lax.scan(full_round, state, jnp.asarray(c_mont[:half]))
    state, tr2 = jax.lax.scan(partial_round, state, jnp.asarray(c_mont[half : half + rp]))
    state, tr3 = jax.lax.scan(full_round, state, jnp.asarray(c_mont[half + rp :]))

    def collect(i):
        # scan outputs have leading round axis; flatten (round, lane) in order
        a = jnp.moveaxis(tr1[i], 0, -3)  # (..., half, t, 16)
        a = a.reshape(a.shape[:-3] + (half * t, limb.L))
        b = jnp.moveaxis(tr2[i], 0, -2)  # (..., rp, 16)
        cc = jnp.moveaxis(tr3[i], 0, -3)
        cc = cc.reshape(cc.shape[:-3] + (half * t, limb.L))
        return limb.from_mont(FR, jnp.concatenate([a, b, cc], axis=-2))

    blocks = {"x2": collect(0), "x4": collect(1), "x5": collect(2)}
    return blocks, limb.from_mont(FR, state[..., 0, :])


def strict_bits_trace(bits):
    """Witness twin of gadgets_cs.strict_bits_cs: the suffix-equality chain
    eq[i] = prod_{j>=i} (b_j == k_j) against k = bits(p-1), and the gt terms
    eq[i+1]*b_i at the zero positions of p-1. bits: (..., 254) int32.
    Returns {"eq": (..., 254), "gt": (..., n_zero)} int32 tensors."""
    from .gadgets_cs import P_MINUS_1_BITS, STRICT_ZERO_POS

    k = jnp.asarray(P_MINUS_1_BITS.astype(np.int32))
    t = jnp.where(k == 1, bits, 1 - bits)
    eq = jnp.flip(jnp.cumprod(jnp.flip(t, -1), axis=-1), -1)
    eq_next = jnp.concatenate(
        [eq[..., 1:], jnp.ones(bits.shape[:-1] + (1,), I32)], axis=-1
    )
    zp = np.asarray(STRICT_ZERO_POS)
    gt = eq_next[..., zp] * bits[..., zp]
    return {"eq": eq.astype(I32), "gt": gt.astype(I32)}


def bits_to_limb_block(bits):
    """(..., n) 0/1 int32 -> (..., n, 16) limb values."""
    out = jnp.zeros(bits.shape + (limb.L,), U32)
    return out.at[..., 0].set(bits.astype(U32))


def int_bits(v, n: int):
    """(...,) non-negative int32/int64 -> (..., n) LSB-first bits."""
    shifts = np.arange(n, dtype=np.int64)
    return ((jnp.asarray(v, jnp.int64)[..., None] >> shifts) & 1).astype(I32)


def keccak_static_trace(msg_bytes, n_blocks: int):
    """Witness twin of a static-length keccak chain: msg_bytes
    (..., n_blocks*136) already padded. Returns (blocks, digest_bits) where
    blocks holds, per block b: 'b{b}_ax' (b>0) and the keccak_f_trace blocks
    'b{b}_tc' etc.; digest_bits is (..., 256) of the final state."""
    blk_lo, blk_hi = kdev.bytes_to_blocks(msg_bytes, n_blocks)
    batch = msg_bytes.shape[:-1]
    lo = jnp.zeros(batch + (25,), U32)
    hi = jnp.zeros(batch + (25,), U32)
    blocks = {}
    for b in range(n_blocks):
        ax_lo = lo[..., :17] ^ blk_lo[..., b, :]
        ax_hi = hi[..., :17] ^ blk_hi[..., b, :]
        if b > 0:
            blocks[f"b{b}_ax"] = lane_bits(ax_lo, ax_hi)
        lo = lo.at[..., :17].set(ax_lo)
        hi = hi.at[..., :17].set(ax_hi)
        kb, (lo, hi) = keccak_f_trace(lo, hi)
        for k, v in kb.items():
            blocks[f"b{b}_{k}"] = v
    digest_bits = lane_bits(lo[..., :4], hi[..., :4]).reshape(batch + (256,))
    return blocks, digest_bits


def keccak_bytes_trace(data, in_len, max_blocks: int):
    """Witness twin of gadgets_cs.keccak_bytes_cs. data: (..., max_bytes)
    int32 bytes; in_len: (...,) int32. Returns (blocks, digest_bits) with
    block keys matching the cs allocation order (sans name prefix)."""
    max_bytes = max_blocks * 136
    batch = data.shape[:-1]
    in_len = jnp.asarray(in_len, I32)
    div = in_len // 136
    rem = in_len % 136
    blocks = {
        "div": div[..., None].astype(I32),
        "rem_bits": int_bits(rem, 8),
        "rem_hi_bits": int_bits(135 - rem, 8),
        "len_oh": jax.nn.one_hot(in_len, max_bytes, dtype=I32),
        "blk_oh": jax.nn.one_hot(div, max_blocks, dtype=I32),
    }
    idx = jnp.arange(max_bytes, dtype=I32)
    blocks["filter"] = (idx < in_len[..., None]).astype(I32)
    padded, _ = kdev.pad_bytes(data, in_len, max_blocks)
    blocks["padded"] = padded
    blocks["pbits"] = int_bits(padded[..., None], 8).reshape(batch + (max_bytes, 8))

    kblocks, digest_per_block = _dynamic_absorb_trace(padded, max_blocks)
    blocks.update(kblocks)
    # digest select partials: sel[b, bit] = blk_oh[b] * digest_b[bit]
    sel = blocks["blk_oh"][..., :, None] * digest_per_block  # (..., max_blocks, 256)
    blocks["sel"] = sel.astype(I32)
    digest_bits = jnp.sum(sel, axis=-2).astype(I32)
    return blocks, digest_bits


def _dynamic_absorb_trace(padded, max_blocks: int):
    blk_lo, blk_hi = kdev.bytes_to_blocks(padded, max_blocks)
    batch = padded.shape[:-1]
    lo = jnp.zeros(batch + (25,), U32)
    hi = jnp.zeros(batch + (25,), U32)
    blocks = {}
    digests = []
    for b in range(max_blocks):
        ax_lo = lo[..., :17] ^ blk_lo[..., b, :]
        ax_hi = hi[..., :17] ^ blk_hi[..., b, :]
        if b > 0:
            blocks[f"b{b}_ax"] = lane_bits(ax_lo, ax_hi)
        lo = lo.at[..., :17].set(ax_lo)
        hi = hi.at[..., :17].set(ax_hi)
        kb, (lo, hi) = keccak_f_trace(lo, hi)
        for k, v in kb.items():
            blocks[f"b{b}_{k}"] = v
        digests.append(lane_bits(lo[..., :4], hi[..., :4]).reshape(batch + (256,)))
    return blocks, jnp.stack(digests, axis=-2)  # (..., max_blocks, 256)


def digest_bits_to_bytes(digest_bits):
    """(..., 256) bits -> (..., 32) bytes."""
    pairs = digest_bits.reshape(digest_bits.shape[:-1] + (32, 8))
    weights = (1 << np.arange(8)).astype(np.int32)
    return jnp.sum(pairs * weights, axis=-1).astype(I32)


# ---------------------------------------------------------------------------
# small-field helpers for hint wires
# ---------------------------------------------------------------------------


def i32_sub_mod_p(a, b):
    """(a - b) mod p as limb scalars, for small non-negative int32 a, b."""
    a = jnp.asarray(a, jnp.int64)
    b = jnp.asarray(b, jnp.int64)
    d = a - b
    pos = jnp.maximum(d, 0).astype(jnp.uint32)
    neg = jnp.maximum(-d, 0).astype(jnp.uint32)
    pos_l = jnp.zeros(d.shape + (limb.L,), U32).at[..., 0].set(pos & 0xFFFF).at[..., 1].set(pos >> 16)
    neg_l = jnp.zeros(d.shape + (limb.L,), U32).at[..., 0].set(neg & 0xFFFF).at[..., 1].set(neg >> 16)
    return limb.sub(FR, pos_l, neg_l)


def is_zero_hints(diff_limbs):
    """diff values (n, ..., 16) canonical -> (out bits, inv limbs) matching
    gadgets_cs.is_zero_cs ({name}_inv then {name}_out order is handled by the
    caller)."""
    zero = limb.is_zero(diff_limbs)
    dm = limb.to_mont(FR, diff_limbs)
    inv = limb.from_mont(FR, limb.batch_inv_mont(FR, dm, axis=0))
    return (~zero).astype(I32) * 0 + zero.astype(I32), inv
