"""Batched Keccak256 sponge on device (JAX).

State: 25 64-bit lanes held as two uint32 planes (lo, hi), shape (..., 25) —
the TPU VPU has no 64-bit integers, so every 64-bit op is a fused pair of
32-bit ops. One hash instance per batch lane; everything static-shape.

Dynamic input lengths follow the reference's compute-all-then-select design
(circuits/utils/keccak.circom:330-349 `Final`, :412-446 `Pad`): all maxBlocks
absorptions are computed unconditionally and the state after `numBlocks`
absorptions is gathered, while padding bytes are placed by masks — including
the 0x81 same-byte collision case (keccak.circom:398).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
RATE = 136  # bytes per block (keccak256: rate 1088, capacity 512)

# Per-output-lane (rho+pi) source index and rotation: B[y + 5((2x+3y)%5)] =
# rotl(A[x + 5y], R[x][y]).
_ROTC = np.array(
    [
        [0, 36, 3, 41, 18],
        [1, 44, 10, 45, 2],
        [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56],
        [27, 20, 39, 8, 14],
    ]
)
_SRC = np.zeros(25, np.int32)
_ROT = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
        _ROT[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _ROTC[_x][_y]

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], np.uint32)

# chi neighbor indices: out[i] = b[i] ^ (~b[n1[i]] & b[n2[i]])
_CHI1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)], np.int32)
_CHI2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)], np.int32)


def _rotl64(lo, hi, r):
    """Rotate-left 64-bit lanes (lo, hi) by per-lane amounts r (broadcastable)."""
    r = jnp.asarray(r, U32)
    swap = r >= 32
    lo2 = jnp.where(swap, hi, lo)
    hi2 = jnp.where(swap, lo, hi)
    rr = jnp.where(swap, r - 32, r)  # 0..31
    # (x >> (32-rr)) written as (x >> (31-rr)) >> 1 so rr=0 stays in-range
    nlo = (lo2 << rr) | ((hi2 >> (31 - rr)) >> 1)
    nhi = (hi2 << rr) | ((lo2 >> (31 - rr)) >> 1)
    return nlo, nhi


def _round(lo, hi, rc_lo, rc_hi):
    # theta
    clo = lo[..., 0:5] ^ lo[..., 5:10] ^ lo[..., 10:15] ^ lo[..., 15:20] ^ lo[..., 20:25]
    chi_ = hi[..., 0:5] ^ hi[..., 5:10] ^ hi[..., 10:15] ^ hi[..., 15:20] ^ hi[..., 20:25]
    rot_lo, rot_hi = _rotl64(
        jnp.roll(clo, -1, axis=-1), jnp.roll(chi_, -1, axis=-1), 1
    )
    dlo = jnp.roll(clo, 1, axis=-1) ^ rot_lo
    dhi = jnp.roll(chi_, 1, axis=-1) ^ rot_hi
    dlo = jnp.tile(dlo, (1,) * (dlo.ndim - 1) + (5,))
    dhi = jnp.tile(dhi, (1,) * (dhi.ndim - 1) + (5,))
    lo = lo ^ dlo
    hi = hi ^ dhi
    # rho + pi (static gather + per-lane rotation)
    blo, bhi = _rotl64(lo[..., _SRC], hi[..., _SRC], _ROT)
    # chi
    lo = blo ^ (~blo[..., _CHI1] & blo[..., _CHI2])
    hi = bhi ^ (~bhi[..., _CHI1] & bhi[..., _CHI2])
    # iota
    lo = lo.at[..., 0].set(lo[..., 0] ^ rc_lo)
    hi = hi.at[..., 0].set(hi[..., 0] ^ rc_hi)
    return lo, hi


def keccak_f(lo, hi):
    """Keccak-f[1600] on (..., 25) uint32 lane planes."""

    def body(carry, rc):
        lo, hi = carry
        lo, hi = _round(lo, hi, rc[0], rc[1])
        return (lo, hi), None

    rcs = jnp.stack([jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)], axis=1)
    (lo, hi), _ = jax.lax.scan(body, (lo, hi), rcs)
    return lo, hi


def pad_bytes(data, in_len, max_blocks: int):
    """Reference `Pad` semantics (keccak.circom:412-446): keep the first
    in_len bytes, add 0x01 at position in_len and 0x80 at the last byte of
    block numBlocks (0x81 when they coincide).

    data: (..., max_blocks*136) int32 bytes; in_len: (...,) int32.
    Returns (padded, num_blocks)."""
    max_bytes = max_blocks * RATE
    idx = jnp.arange(max_bytes, dtype=jnp.int32)
    in_len = jnp.asarray(in_len, jnp.int32)[..., None]
    num_blocks = in_len // RATE + 1
    keep = (idx < in_len).astype(jnp.int32)
    is_eq = (idx == in_len).astype(jnp.int32)
    is_last = (idx == num_blocks * RATE - 1).astype(jnp.int32)
    padded = data * keep + 0x01 * is_eq + 0x80 * is_last
    return padded, num_blocks[..., 0]


def bytes_to_blocks(padded, max_blocks: int):
    """(..., max_blocks*136) bytes -> lo/hi lane planes (..., max_blocks, 17)."""
    b = padded.astype(U32).reshape(padded.shape[:-1] + (max_blocks, 17, 8))
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    return lo, hi


def state_to_digest(lo, hi):
    """First 4 lanes of the state -> (..., 32) int32 digest bytes."""
    lanes_lo = lo[..., :4]
    lanes_hi = hi[..., :4]
    parts = [
        lanes_lo & 0xFF, (lanes_lo >> 8) & 0xFF, (lanes_lo >> 16) & 0xFF, (lanes_lo >> 24) & 0xFF,
        lanes_hi & 0xFF, (lanes_hi >> 8) & 0xFF, (lanes_hi >> 16) & 0xFF, (lanes_hi >> 24) & 0xFF,
    ]
    bytes_ = jnp.stack(parts, axis=-1)  # (..., 4, 8)
    return bytes_.reshape(bytes_.shape[:-2] + (32,)).astype(jnp.int32)


def keccak_bytes(data, in_len, max_blocks: int, return_states: bool = False):
    """Keccak256 of dynamic-length byte arrays (reference `KeccakBytes`,
    keccak.circom:454-489).

    data: (..., max_blocks*136) int32 bytes (values 0..255); in_len: (...,)
    with in_len < max_blocks*136 (caller checks, as the circuit asserts at
    keccak.circom:460). Returns (..., 32) int32 digest bytes.

    Computes all max_blocks absorptions and selects the state after
    num_blocks — the compute-all-then-select pattern of `Final`
    (keccak.circom:330-349), which is exactly the right shape for XLA."""
    padded, num_blocks = pad_bytes(data, in_len, max_blocks)
    blk_lo, blk_hi = bytes_to_blocks(padded, max_blocks)  # (..., max_blocks, 17)
    batch_shape = padded.shape[:-1]
    lo = jnp.zeros(batch_shape + (25,), U32)
    hi = jnp.zeros(batch_shape + (25,), U32)

    def absorb(carry, blk):
        lo, hi = carry
        blo, bhi = blk
        lo = lo.at[..., :17].set(lo[..., :17] ^ blo)
        hi = hi.at[..., :17].set(hi[..., :17] ^ bhi)
        lo, hi = keccak_f(lo, hi)
        return (lo, hi), (lo, hi)

    # scan over the block axis (moved to front)
    blk_lo_t = jnp.moveaxis(blk_lo, -2, 0)
    blk_hi_t = jnp.moveaxis(blk_hi, -2, 0)
    _, (states_lo, states_hi) = jax.lax.scan(absorb, (lo, hi), (blk_lo_t, blk_hi_t))
    # states[b] = state after b+1 absorptions; select index num_blocks-1
    sel = (num_blocks - 1).astype(jnp.int32)  # (...,)
    sel_oh = jax.nn.one_hot(sel, max_blocks, dtype=U32)  # (..., max_blocks)
    sel_oh = jnp.moveaxis(sel_oh, -1, 0)  # (max_blocks, ...)
    fin_lo = jnp.sum(states_lo * sel_oh[..., None], axis=0).astype(U32)
    fin_hi = jnp.sum(states_hi * sel_oh[..., None], axis=0).astype(U32)
    digest = state_to_digest(fin_lo, fin_hi)
    if return_states:
        return digest, (states_lo, states_hi)
    return digest


def keccak_fixed(data):
    """Keccak256 of a fixed-length byte array (..., n) with n known statically."""
    n = data.shape[-1]
    max_blocks = n // RATE + 1
    buf = jnp.zeros(data.shape[:-1] + (max_blocks * RATE,), jnp.int32)
    buf = buf.at[..., :n].set(data)
    in_len = jnp.full(data.shape[:-1], n, jnp.int32)
    return keccak_bytes(buf, in_len, max_blocks)
