"""Gadget unit tests: truth tables matching the reference testcase corpus
(tests/testcases/{rlp/*,substring_check,selector,shift,concat,array}.py),
recomputed from first principles."""

import numpy as np
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.gadgets import bytesops as B
from pob_tpu.gadgets import rlp as R
from pob_tpu.gadgets.substring import substring_check


def lset(*ints):
    return jnp.asarray(limb.ints_to_limbs(ints))


# ---------------------------------------------------------------------------
# byte plumbing
# ---------------------------------------------------------------------------


def test_filter_fit_mask_shift_concat():
    assert np.asarray(B.filter_mask(jnp.asarray([3]), 5)).tolist() == [[1, 1, 1, 0, 0]]
    assert np.asarray(B.filter_mask(jnp.asarray([10]), 5)).tolist() == [[1, 1, 1, 1, 1]]
    assert np.asarray(B.filter_mask(jnp.asarray([0]), 5)).tolist() == [[0, 0, 0, 0, 0]]

    a = jnp.asarray([[1, 2, 3, 4, 5]])
    out, ok = B.shift_left(a, jnp.asarray([2]))
    assert out.tolist() == [[3, 4, 5, 0, 0]] and bool(ok[0])
    out, ok = B.shift_right(jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]]), jnp.asarray([3]), 5)
    assert out.tolist() == [[0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 0, 0]] and bool(ok[0])

    out = B.mask(a, jnp.asarray([3]))
    assert out.tolist() == [[1, 2, 3, 0, 0]]

    o, olen, ok = B.concat(
        a, jnp.asarray([3]), jnp.asarray([[10, 20, 30, 40, 50]]), jnp.asarray([2])
    )
    assert o.tolist() == [[1, 2, 3, 10, 20, 0, 0, 0, 0, 0]]
    assert olen.tolist() == [5] and bool(ok[0])


def test_selector_bounds():
    vals = jnp.asarray([[10, 20, 30, 40]])
    out, ok = B.selector(vals, jnp.asarray([2]))
    assert out.tolist() == [30] and bool(ok[0])
    _, ok = B.selector(vals, jnp.asarray([4]))
    assert not bool(ok[0]), "out-of-range select must reject (selector.circom:43)"


def test_count_bytes():
    b = jnp.asarray([[0, 0, 0, 3, 0, 1, 4, 2]])
    assert np.asarray(B.count_bytes(b)).tolist() == [5]
    assert np.asarray(B.count_bytes(jnp.zeros((1, 8), jnp.int32))).tolist() == [0]


def test_nibbles():
    b = jnp.asarray([[0x12, 0x34, 0x56]])
    nib = B.bytes_to_nibbles(b)
    assert nib.tolist() == [[1, 2, 3, 4, 5, 6]]
    back, ok = B.nibbles_to_bytes(nib)
    assert back.tolist() == [[0x12, 0x34, 0x56]] and bool(ok[0])


# ---------------------------------------------------------------------------
# RLP integer (rlp/integer.circom semantics table at :55-62)
# ---------------------------------------------------------------------------

RLP_INT_CASES = [
    (0, [0x80], 1),
    (1, [0x01], 1),
    (10, [0x0A], 1),
    (127, [0x7F], 1),
    (128, [0x81, 0x80], 2),
    (255, [0x81, 0xFF], 2),
    (256, [0x82, 0x01, 0x00], 3),
    (65535, [0x82, 0xFF, 0xFF], 3),
    (65536, [0x83, 0x01, 0x00, 0x00], 4),
]


def test_rlp_integer():
    n = 3
    vals = lset(*[c[0] for c in RLP_INT_CASES])
    out, out_len, ok = R.rlp_integer(vals, n)
    out = np.asarray(out)
    for i, (v, exp, explen) in enumerate(RLP_INT_CASES):
        got = out[i][: int(out_len[i])].tolist()
        assert got == exp, (v, got, exp)
        assert int(out_len[i]) == explen
        assert bool(ok[i])
    # overflow: value needing more than n bytes must reject
    _, _, ok = R.rlp_integer(lset(2**24), 3)
    assert not bool(ok[0])


# host-side minimal RLP encoder, used as independent expectation
def _rlp_encode(item):
    if isinstance(item, int):
        if item == 0:
            b = b""
        else:
            b = item.to_bytes((item.bit_length() + 7) // 8, "big")
        item = b
    if isinstance(item, bytes):
        if len(item) == 1 and item[0] < 0x80:
            return item
        if len(item) <= 55:
            return bytes([0x80 + len(item)]) + item
        ln = len(item).to_bytes((len(item).bit_length() + 7) // 8, "big")
        return bytes([0xB7 + len(ln)]) + ln + item
    payload = b"".join(_rlp_encode(x) for x in item)
    if len(payload) <= 55:
        return bytes([0xC0 + len(payload)]) + payload
    ln = len(payload).to_bytes((len(payload).bit_length() + 7) // 8, "big")
    return bytes([0xF7 + len(ln)]) + ln + payload


def test_rlp_empty_account_vs_rlp():
    for bal, width in [(0, 3), (123, 3), (255, 3), (2**24 - 1, 3), (10**18, 31)]:
        out, out_len, ok = R.rlp_empty_account(lset(bal), width)
        got = bytes(np.asarray(out)[0][: int(out_len[0])].tolist())
        expect = _rlp_encode([0, bal, R.EMPTY_STORAGE_HASH, R.EMPTY_CODE_HASH])
        assert got == expect, (bal, got.hex(), expect.hex())
        assert bool(ok[0])


# ---------------------------------------------------------------------------
# TruncatedAddressHash truth table (merkle_patricia_trie_leaf.circom:17-45)
# ---------------------------------------------------------------------------

TAH_CASES = [  # (len, out, outLen) for nibbles [1,2,3,4,5,6], 3 bytes
    (6, [0x20, 0x12, 0x34, 0x56], 4),
    (5, [0x32, 0x34, 0x56, 0x00], 3),
    (4, [0x20, 0x34, 0x56, 0x00], 3),
    (3, [0x34, 0x56, 0x00, 0x00], 2),
    (2, [0x20, 0x56, 0x00, 0x00], 2),
    (1, [0x36, 0x00, 0x00, 0x00], 1),
    (0, [0x20, 0x00, 0x00, 0x00], 1),
]


def test_truncated_address_hash():
    nib = jnp.asarray([[1, 2, 3, 4, 5, 6]] * len(TAH_CASES))
    lens = jnp.asarray([c[0] for c in TAH_CASES])
    out, out_len, ok = R.truncated_address_hash(nib, lens, 3)
    out = np.asarray(out)
    for i, (ln, exp, explen) in enumerate(TAH_CASES):
        assert out[i].tolist() == exp, (ln, out[i].tolist())
        assert int(out_len[i]) == explen
        assert bool(ok[i])
    _, _, ok = R.truncated_address_hash(nib[:1], jnp.asarray([7]), 3)
    assert not bool(ok[0]), "len > 2*bytes must reject"


# ---------------------------------------------------------------------------
# LeafDetector near-miss table (tests/testcases/rlp/merkle_patricia_trie_leaf.py)
# ---------------------------------------------------------------------------


def _ld(layer, ln, n=16):
    arr = jnp.asarray([layer + [0] * (n - len(layer))])
    out, ok = R.leaf_detector(arr, jnp.asarray([ln]))
    assert bool(ok[0])
    return int(out[0])


def test_leaf_detector_near_misses():
    l1 = [0xF8, 12, 0x83, 1, 2, 3, 0xB8, 6, 0xF8, 4, 1, 2, 3, 4, 0, 0]
    l2 = [0xF8, 12, 0x82, 1, 2, 3, 0xB8, 6, 0xF8, 4, 1, 2, 3, 4, 0, 0]
    l3 = [0xF8, 12, 0x82, 1, 2, 0xB8, 6, 0xF8, 4, 1, 2, 3, 4, 0, 0, 0]
    l4 = [0xF8, 11, 0x82, 1, 2, 0xB8, 6, 0xF8, 4, 1, 2, 3, 4, 0, 0, 0]
    l5 = [0xF8, 12, 0x83, 1, 2, 3, 0xB8, 7, 0xF8, 4, 1, 2, 3, 4, 0, 0]
    l6 = [0xF8, 12, 0x83, 1, 2, 3, 0xB8, 7, 0xF8, 5, 1, 2, 3, 4, 0, 0]
    l7 = [0xF8, 13, 0x83, 1, 2, 3, 0xB8, 7, 0xF8, 5, 1, 2, 3, 4, 5, 0]
    l8 = [0xF8, 12, 0x83, 1, 2, 3, 0xB8, 7, 0xF8, 5, 1, 2, 3, 4, 5, 0]
    assert _ld(l1, 14) == 1
    assert _ld(l1, 13) == 0
    assert _ld(l2, 13) == 0
    assert _ld(l3, 13) == 0
    assert _ld(l4, 13) == 1
    assert _ld(l5, 14) == 0
    assert _ld(l5, 15) == 0
    assert _ld(l6, 15) == 0
    assert _ld(l7, 15) == 1
    assert _ld(l8, 14) == 0


def test_leaf_detector_real_extremes():
    shortest = list(_rlp_encode([b"\x20", _rlp_encode([0, 0, b"\xff" * 32, b"\xff" * 32])]))
    longest = list(
        _rlp_encode(
            [b"\x20" + b"\xff" * 32, _rlp_encode([2**256 - 1, 2**256 - 1, b"\xff" * 32, b"\xff" * 32])]
        )
    )
    assert len(shortest) == 75 and len(longest) == 172  # doc'd extremes (:217-242)
    assert _ld(shortest, 75, 544) == 1
    assert _ld(longest, 172, 544) == 1


# ---------------------------------------------------------------------------
# full MPT leaf builder (RlpMerklePatriciaTrieLeaf(3, 3))
# ---------------------------------------------------------------------------


def test_mpt_leaf_small():
    nib = jnp.asarray([[0xA, 0xB, 0xC, 0xD, 0xE, 0xF]] * 4)
    lens = jnp.asarray([2, 3, 4, 6])
    bal = lset(123, 123, 123, 123)
    out, out_len, ok = R.mpt_leaf(nib, lens, bal, max_balance_bytes=3,
                                  max_address_hash_bytes=3)
    out = np.asarray(out)
    acct = _rlp_encode([0, 123, R.EMPTY_STORAGE_HASH, R.EMPTY_CODE_HASH])
    keys = [b"\x20\xef", b"\x3d\xef", b"\x20\xcd\xef", b"\x20\xab\xcd\xef"]
    for i, key in enumerate(keys):
        assert bool(ok[i])
        expect = _rlp_encode([key, acct])
        got = bytes(out[i][: int(out_len[i])].tolist())
        assert got == expect, (i, got.hex(), expect.hex())
    # keyLen < 2 must reject (:151)
    _, _, ok = R.mpt_leaf(nib[:2], jnp.asarray([0, 1]), bal[:2], 3, 3)
    assert not bool(ok[0]) and not bool(ok[1])


# ---------------------------------------------------------------------------
# substring check (tests/testcases/substring_check.py semantics)
# ---------------------------------------------------------------------------


def test_substring_check():
    main = jnp.asarray([[12, 23, 34, 45, 56, 67, 78, 89, 98, 87]])
    sub = jnp.asarray([[56, 67, 78]])
    found, ok = substring_check(main, jnp.asarray([6]), sub)
    assert bool(ok[0]) and int(found[0]) == 0  # window ends past mainLen
    found, ok = substring_check(main, jnp.asarray([7]), sub)
    assert bool(ok[0]) and int(found[0]) == 1
    # non-byte values must reject
    found, ok = substring_check(
        jnp.asarray([[1, 123, 256, 1, 1, 0, 0, 0, 1, 0]]), jnp.asarray([3]),
        jnp.asarray([[1, 123, 256]]),
    )
    assert not bool(ok[0])
    # subLen > mainLen must reject
    found, ok = substring_check(main, jnp.asarray([2]), sub)
    assert not bool(ok[0])
