"""Keccak256 bit-exactness: golden model vs public vectors, device sponge vs
golden model across the reference's boundary lengths
(tests/testcases/keccak.py:69-90: 0, 1, 5, 135, 136, 137, 271)."""

import numpy as np
import jax
import jax.numpy as jnp

from pob_tpu.hash.keccak_ref import keccak256
from pob_tpu.hash import keccak as kdev

# Public known-answer vectors for Ethereum Keccak256.
KNOWN = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
    b"EIP-7503": None,  # checked against the protocol constant below
}


def test_golden_known_vectors():
    assert keccak256(b"").hex() == KNOWN[b""]
    assert keccak256(b"abc").hex() == KNOWN[b"abc"]
    # The Poseidon domain prefix is keccak("EIP-7503") mod p
    # (reference tests/constants.py:3-5).
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.hash.poseidon_params import POSEIDON_PREFIX

    assert int.from_bytes(keccak256(b"EIP-7503"), "big") % FR_MOD == POSEIDON_PREFIX


def _run_device(datas, max_blocks):
    max_bytes = max_blocks * 136
    batch = len(datas)
    buf = np.zeros((batch, max_bytes), np.int32)
    lens = np.zeros((batch,), np.int32)
    for i, d in enumerate(datas):
        buf[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    fn = jax.jit(lambda b, l: kdev.keccak_bytes(b, l, max_blocks))
    return np.asarray(fn(jnp.asarray(buf), jnp.asarray(lens)))


def test_device_dynamic_lengths():
    rs = np.random.RandomState(42)
    lengths = [0, 1, 5, 20, 104, 128, 135, 136, 137, 200, 271, 300, 400, 543]
    datas = [rs.randint(0, 256, size=(n,)).astype(np.uint8).tobytes() for n in lengths]
    out = _run_device(datas, max_blocks=4)
    for i, d in enumerate(datas):
        assert bytes(out[i].tolist()) == keccak256(d), f"len={len(d)}"


def test_device_single_block():
    datas = [b"", b"abc", b"EIP-7503", bytes(range(135))]
    out = _run_device(datas, max_blocks=1)
    for i, d in enumerate(datas):
        assert bytes(out[i].tolist()) == keccak256(d)


def test_device_fixed_length():
    d = bytes(range(200))
    arr = jnp.asarray(np.frombuffer(d, np.uint8).astype(np.int32)[None])
    out = np.asarray(jax.jit(kdev.keccak_fixed)(arr))
    assert bytes(out[0].tolist()) == keccak256(d)


def test_pad_examples():
    """The worked Pad table from keccak.circom:390-407 (blockSize=4 analog is
    exercised at real blockSize=136 via edge lengths instead)."""
    # length 135 -> single 0x81 byte at position 135
    data = np.zeros((1, 136), np.int32)
    padded, nb = kdev.pad_bytes(jnp.asarray(data), jnp.asarray([135]), 1)
    padded = np.asarray(padded)
    assert padded[0, 135] == 0x81 and nb[0] == 1
    # length 0 -> 0x01 at 0, 0x80 at 135
    padded, nb = kdev.pad_bytes(jnp.asarray(data), jnp.asarray([0]), 1)
    padded = np.asarray(padded)
    assert padded[0, 0] == 0x01 and padded[0, 135] == 0x80 and nb[0] == 1
