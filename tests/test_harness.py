"""Harness tests: RLP codec, native + python PoW grinder, header assembly,
input generation round-trip against the recorded fixture."""

import json
import os

import pytest

from pob_tpu.harness import rlp_host as rlp
from pob_tpu.harness.pow_grind import _lib, find_burn_key, pow_digest
from pob_tpu.harness.generate import burn_address, leaf_nibble_count
from pob_tpu.hash.keccak_ref import keccak256

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "pob_input.json")


def test_rlp_roundtrip():
    cases = [
        b"",
        b"\x01",
        b"\x7f",
        b"\x80",
        b"dog",
        b"x" * 55,
        b"y" * 56,
        b"z" * 300,
        [b"cat", b"dog"],
        [],
        [[b"a"], [b"b", [b"c"]]],
    ]
    for c in cases:
        assert rlp.decode(rlp.encode(c)) == c
    assert rlp.encode(0) == b"\x80"
    assert rlp.encode(127) == b"\x7f"
    assert rlp.encode(128) == b"\x81\x80"
    assert rlp.encode(1024) == b"\x82\x04\x00"


def test_pow_grind_native_and_fallback():
    # 1 zero byte: expected ~256 iterations — fast for both paths
    key_native = find_burn_key(234, 43287974328, 1, start_key=1000)
    assert pow_digest(key_native, 234, 43287974328)[:1] == b"\x00"
    import pob_tpu.harness.pow_grind as pg

    lib_backup = pg._LIB, pg._LIB_TRIED
    try:
        pg._LIB, pg._LIB_TRIED = None, True  # force python fallback
        key_py = find_burn_key(234, 43287974328, 1, start_key=1000, max_iters=5000)
        assert key_py == key_native, "native and python grinders must agree"
    finally:
        pg._LIB, pg._LIB_TRIED = lib_backup


def test_native_digest_matches_golden():
    lib = _lib()
    if lib is None:
        pytest.skip("no native grinder")
    import ctypes

    msg = bytes(range(96)) + b"EIP-7503"
    out = ctypes.create_string_buffer(32)
    lib.pow_digest(msg, out)
    assert out.raw == keccak256(msg)


def test_fixture_burn_key_is_valid_pow():
    d = json.load(open(FIX))
    dg = pow_digest(int(d["burnKey"]), int(d["revealAmount"]), int(d["burnExtraCommitment"]))
    assert dg[:2] == b"\x00\x00"


def test_burn_address_consistent_with_fixture_leaf():
    """The fixture's last MPT layer must be the leaf for the burn address
    derived from the fixture's burn key."""
    d = json.load(open(FIX))
    addr = burn_address(
        int(d["burnKey"]), int(d["revealAmount"]), int(d["burnExtraCommitment"])
    )
    addr_hash = keccak256(addr)
    leaf = bytes(d["layers"][d["numLayers"] - 1][: d["layerLens"][d["numLayers"] - 1]])
    n_nib = leaf_nibble_count(leaf)
    assert n_nib == int(d["numLeafAddressNibbles"])
    term, _account = rlp.decode(leaf)
    nibbles = [b for byte in addr_hash for b in (byte >> 4, byte & 0xF)]
    kept = nibbles[64 - n_nib :]
    if n_nib % 2 == 0:
        expect = bytes([0x20]) + bytes(
            kept[i] * 16 + kept[i + 1] for i in range(0, n_nib, 2)
        )
    else:
        expect = bytes([0x30 + kept[0]]) + bytes(
            kept[i] * 16 + kept[i + 1] for i in range(1, n_nib, 2)
        )
    assert term == expect
