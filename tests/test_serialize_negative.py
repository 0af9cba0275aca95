"""Negative .zkey format tests (VERDICT r04 item 8): structurally broken
files must RAISE ZkeyFormatError, never misparse into a plausible-looking
proving key. The reference's downstream is stock snarkjs
(/root/reference/.github/workflows/circuitscan.yml:27-39); with no node in
this sandbox the format is pinned by golden bytes (test_serialize_golden.py)
plus these adversarial structural properties.

The baseline zkey is built once from a tiny circuit via the pure-host setup
(groth16.setup_host — no device compiles), then each test corrupts one
structural aspect of the byte stream.
"""

import struct

import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.prover import groth16
from pob_tpu.prover.serialize import ZkeyFormatError, read_zkey, write_zkey
from pob_tpu.r1cs.builder import ConstraintSystem


def _toy():
    # x*y = pub0; (x+y)^2 = t  — satisfied by [1, 42, 6, 7, 169]
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (1,))
    cs.mark_public(1)
    priv = cs.alloc_block("priv", (3,))
    x, y, t = (int(v) for v in priv)
    cs.add([(x, 1)], [(y, 1)], [(int(pub[0]), 1)])
    cs.add([(x, 1), (y, 1)], [(x, 1), (y, 1)], [(t, 1)])
    return cs, [1, 42, 6, 7, 169]


@pytest.fixture(scope="module")
def zkey_bytes(tmp_path_factory):
    cs, _w = _toy()
    pk, vk = groth16.setup_host(cs, rng=iter(range(101, 1000, 7)).__next__)
    p = tmp_path_factory.mktemp("zkey") / "toy.zkey"
    write_zkey(str(p), pk, vk, cs)
    return p.read_bytes()


def _parse(tmp_path, data: bytes):
    p = tmp_path / "t.zkey"
    p.write_bytes(data)
    return read_zkey(str(p))


def _section_offsets(data: bytes):
    """{sid: (header_off, body_off, body_len)} from the section table."""
    _v, n = struct.unpack_from("<II", data, 4)
    off = 12
    out = {}
    for _ in range(n):
        sid, slen = struct.unpack_from("<iq", data, off)
        out[sid] = (off, off + 12, slen)
        off += 12 + slen
    return out


def test_baseline_parses(tmp_path, zkey_bytes):
    d = _parse(tmp_path, zkey_bytes)
    assert d["n_public"] == 1 and d["domain_size"] == 4
    assert d["a_pts"].shape[0] == d["n_vars"]


def test_bad_magic_rejected(tmp_path, zkey_bytes):
    with pytest.raises((ZkeyFormatError, AssertionError)):
        _parse(tmp_path, b"zkex" + zkey_bytes[4:])


@pytest.mark.parametrize("frac", [0.1, 0.5, 0.9, 0.999])
def test_truncation_rejected(tmp_path, zkey_bytes, frac):
    cut = max(4, int(len(zkey_bytes) * frac))
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, zkey_bytes[:cut])


def test_wrong_n8_rejected(tmp_path, zkey_bytes):
    hdr_off, body_off, _len = _section_offsets(zkey_bytes)[2]
    # n8q is the first u32 of section 2
    data = bytearray(zkey_bytes)
    struct.pack_into("<I", data, body_off, 48)
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_wrong_prime_rejected(tmp_path, zkey_bytes):
    _h, body_off, _l = _section_offsets(zkey_bytes)[2]
    data = bytearray(zkey_bytes)
    data[body_off + 4] ^= 0xFF  # flip a byte of q
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_lying_section_length_rejected(tmp_path, zkey_bytes):
    # A-points section claims more bytes than the file holds
    offs = _section_offsets(zkey_bytes)
    hdr_off, _b, slen = offs[5]
    data = bytearray(zkey_bytes)
    struct.pack_into("<q", data, hdr_off + 4, len(zkey_bytes) * 2)
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_point_count_mismatch_rejected(tmp_path, zkey_bytes):
    # remove one G1 point (64 bytes) from the A section: header still
    # claims nVars points -> must raise, not silently shift every section
    offs = _section_offsets(zkey_bytes)
    hdr_off, body_off, slen = offs[5]
    data = bytearray(zkey_bytes)
    struct.pack_into("<q", data, hdr_off + 4, slen - 64)
    del data[body_off : body_off + 64]
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_missing_section_rejected(tmp_path, zkey_bytes):
    # drop the H-points section entirely (and fix n_sections)
    offs = _section_offsets(zkey_bytes)
    hdr_off, body_off, slen = offs[9]
    data = bytearray(zkey_bytes)
    del data[hdr_off : body_off + slen]
    _v, n = struct.unpack_from("<II", data, 4)
    struct.pack_into("<II", data, 4, _v, n - 1)
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_coeff_count_lies_rejected(tmp_path, zkey_bytes):
    _h, body_off, _l = _section_offsets(zkey_bytes)[4]
    data = bytearray(zkey_bytes)
    (n,) = struct.unpack_from("<I", data, body_off)
    struct.pack_into("<I", data, body_off, n + 3)
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_coeff_wire_out_of_range_rejected(tmp_path, zkey_bytes):
    _h, body_off, _l = _section_offsets(zkey_bytes)[4]
    data = bytearray(zkey_bytes)
    # first coefficient record: (m, row, wire) u32s after the count
    struct.pack_into("<I", data, body_off + 4 + 8, 10_000)
    with pytest.raises(ZkeyFormatError):
        _parse(tmp_path, bytes(data))


def test_section_reordering_tolerated(tmp_path, zkey_bytes):
    """Section order is carried by ids, not position: a reordered but
    complete file must parse to the same materials."""
    offs = _section_offsets(zkey_bytes)
    chunks = {
        sid: zkey_bytes[h : b + l] for sid, (h, b, l) in offs.items()
    }
    order = [3, 1, 9, 2, 5, 4, 7, 6, 8, 10]
    data = zkey_bytes[:12] + b"".join(chunks[s] for s in order)
    d0 = _parse(tmp_path, zkey_bytes)
    d1 = _parse(tmp_path, data)
    assert d1["alpha1"] == d0["alpha1"] and d1["ic"] == d0["ic"]
    assert (d1["h_pts"] == d0["h_pts"]).all()


def test_roundtrip_through_setup_host(tmp_path, zkey_bytes):
    """The host-setup zkey loads back into a working prover: prove + verify
    round-trip through the interchange format (cross-checks setup_host
    against the device-setup path pinned by test_groth16.py)."""
    p = tmp_path / "t.zkey"
    p.write_bytes(zkey_bytes)
    pk, vk = groth16.load_zkey(str(p))
    _cs, w = _toy()
    proof = groth16.prove(pk, limb.ints_to_limbs(w), r=11, s=12)
    assert groth16.verify(vk, proof, w[1:2])
