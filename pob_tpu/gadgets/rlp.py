"""RLP / Merkle-Patricia-Trie gadgets (reference circuits/utils/rlp/*).

All functions are batched/jittable; `ok` flags collect the circom-side
assertions so circuits can reject invalid witnesses."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import limb
from .bytesops import (
    I32,
    concat,
    count_bytes,
    fit,
    filter_mask,
    limb_fits_bits,
    limb_from_i32,
    limb_lt,
    limbs_to_be_bytes_checked,
    mask,
    nibbles_to_bytes,
    selector,
    shift_left,
)

# RLP(storage_hash) + RLP(code_hash) of an empty account, 66 bytes
# (rlp/empty_account.circom:51-120): 0xa0 || keccak256(rlp(0)) snapshot of the
# empty storage trie root, 0xa0 || keccak256(b"") code hash.
EMPTY_STORAGE_HASH = bytes.fromhex(
    "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"
)
EMPTY_CODE_HASH = bytes.fromhex(
    "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
)
_STORAGE_CODE_RLP = np.concatenate(
    [
        np.array([0xA0], np.int32),
        np.frombuffer(EMPTY_STORAGE_HASH, np.uint8).astype(np.int32),
        np.array([0xA0], np.int32),
        np.frombuffer(EMPTY_CODE_HASH, np.uint8).astype(np.int32),
    ]
)  # (66,)


def rlp_integer(value_limbs, n: int):
    """RlpInteger (rlp/integer.circom:67-110): RLP of an integer < 2^(8n),
    n <= 31. Returns (out (..., n+1), out_len, ok)."""
    assert n <= 31
    be, ok_range = limbs_to_be_bytes_checked(value_limbs, n)  # (..., n)
    length = count_bytes(be)
    big_endian, ok_shift = shift_left(be, n - length)
    is_single = limb_lt(value_limbs, limb_from_i32(jnp.asarray(128, jnp.uint32)))
    is_zero = jnp.all(value_limbs == 0, axis=-1)
    last_byte = be[..., -1]
    first = jnp.where(is_single, last_byte, 0x80 + length) + is_zero.astype(I32) * 0x80
    rest = jnp.where(is_single[..., None], 0, big_endian)
    out = jnp.concatenate([first[..., None], rest], axis=-1)
    out_len = (~is_single).astype(I32) + length + is_zero.astype(I32)
    return out, out_len, ok_range & ok_shift


def rlp_empty_account(balance_limbs, max_balance_bytes: int):
    """RlpEmptyAccount (rlp/empty_account.circom:20-134):
    RLP([0, balance, EMPTY_STORAGE_HASH, EMPTY_CODE_HASH]).
    Returns (out (..., 4+max_balance_bytes+66), out_len, ok)."""
    assert max_balance_bytes <= 31
    bal_rlp, bal_rlp_len, ok = rlp_integer(balance_limbs, max_balance_bytes)
    nonce_and_balance_len = 1 + bal_rlp_len
    prefixed_len = 2 + nonce_and_balance_len
    batch = bal_rlp.shape[:-1]
    # [0xf8, total, 0x80(nonce), balanceRlp...]
    head = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(0xF8, I32), batch)[..., None],
            (nonce_and_balance_len + 66)[..., None],
            jnp.broadcast_to(jnp.asarray(0x80, I32), batch)[..., None],
            bal_rlp,
        ],
        axis=-1,
    )  # (..., 4 + max_balance_bytes)
    tail = jnp.broadcast_to(jnp.asarray(_STORAGE_CODE_RLP), batch + (66,))
    out, out_len, ok2 = concat(head, prefixed_len, tail, jnp.full(batch, 66, I32))
    return out, out_len, ok & ok2


def truncated_address_hash(nibbles, nibbles_len, address_hash_bytes: int = 32):
    """TruncatedAddressHash (rlp/merkle_patricia_trie_leaf.circom:50-90):
    hex-prefix encode the LAST `nibbles_len` nibbles.
    Returns (out (..., address_hash_bytes+1), out_len, ok)."""
    two_n = 2 * address_hash_bytes
    nibbles_len = jnp.asarray(nibbles_len, I32)
    ok = (nibbles_len >= 0) & (nibbles_len <= two_n)
    shifted, ok_shift = shift_left(nibbles, two_n - nibbles_len)
    div = nibbles_len // 2
    rem = nibbles_len % 2
    out_nib0 = 2 + rem
    out_nib1 = rem * shifted[..., 0]
    # middle nibbles: shifted[i+1] if odd else shifted[i], for i < 2n-1
    mid = jnp.where(rem[..., None] == 1, shifted[..., 1:], shifted[..., :-1])
    last = (1 - rem) * shifted[..., -1]
    out_nibbles = jnp.concatenate(
        [out_nib0[..., None], out_nib1[..., None], mid, last[..., None]], axis=-1
    )  # (..., 2n + 2)
    out, ok_nib = nibbles_to_bytes(out_nibbles)
    return out, 1 + div, ok & ok_shift & ok_nib


def mpt_leaf(nibbles, nibbles_len, balance_limbs, max_balance_bytes: int,
             max_address_hash_bytes: int = 32):
    """RlpMerklePatriciaTrieLeaf (rlp/merkle_patricia_trie_leaf.circom:102-189):
    the full account leaf RLP([key, RLP(account)]).
    Returns (out (..., maxOutLen), out_len, ok). With (32, 31): maxOutLen=139."""
    max_key_len = 1 + max_address_hash_bytes
    max_rlp_account_len = 4 + max_balance_bytes + 66
    max_value_rlp_len = 2 + max_rlp_account_len
    max_prefixed_key_len = 2 + 1 + max_key_len

    key, key_len, ok_key = truncated_address_hash(
        nibbles, nibbles_len, max_address_hash_bytes
    )
    ok = ok_key & (key_len >= 2)  # AssertGreaterEqThan(keyLen, 2) (:151)

    account, account_len, ok_acc = rlp_empty_account(balance_limbs, max_balance_bytes)
    batch = key.shape[:-1]

    value_rlp = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(0xB8, I32), batch)[..., None],
            account_len[..., None],
            account,
        ],
        axis=-1,
    )
    value_rlp_len = 2 + account_len

    prefixed_key = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(0xF8, I32), batch)[..., None],
            ((key_len + 1) + value_rlp_len)[..., None],
            (0x80 + key_len)[..., None],
            key,
        ],
        axis=-1,
    )  # (..., 3 + max_key_len)
    prefixed_key_len = 3 + key_len

    out, out_len, ok_cat = concat(prefixed_key, prefixed_key_len, value_rlp, value_rlp_len)
    return out, out_len, ok & ok_acc & ok_cat


def leaf_detector(layer, layer_len):
    """LeafDetector (rlp/merkle_patricia_trie_leaf.circom:247-294): boolean
    'parses as an account leaf'. Returns (is_leaf (...,) int32, ok)."""
    n = layer.shape[-1]
    layer_len = jnp.asarray(layer_len, I32)
    ok = (layer_len >= 0) & (layer_len <= n)

    prefix_is_f8 = layer[..., 0] == 0xF8
    total_length = layer[..., 1]
    consistent_len = (total_length + 2) == layer_len
    key_prefix = layer[..., 2]
    key_prefix_valid = key_prefix <= 0xB7
    key_multi_byte = (key_prefix >= 0x81) & (key_prefix <= 0xB7)
    key_extra = jnp.where(key_multi_byte, key_prefix - 0x80, 0)
    key_len = 1 + key_extra

    vw_prefix, ok1 = selector(layer, 2 + key_len)
    vw_len, ok2 = selector(layer, 2 + key_len + 1)
    v_prefix, ok3 = selector(layer, 2 + key_len + 2)
    v_len, ok4 = selector(layer, 2 + key_len + 3)

    is_leaf = (
        prefix_is_f8
        & consistent_len
        & key_prefix_valid
        & (vw_prefix == 0xB8)
        & (vw_len == v_len + 2)
        & (v_prefix == 0xF8)
        & ((key_len + v_len + 6) == layer_len)
    )
    return is_leaf.astype(I32), ok & ok1 & ok2 & ok3 & ok4
