"""Golden-byte validation of the circom/snarkjs binary formats.

snarkjs/circom are not available in this environment (no node, zero egress),
so these fixtures are hand-assembled from the documented binary layouts
(iden3 binfile conventions: the same layouts circom emits and snarkjs
consumes — SURVEY.md §2.8). The writer must reproduce the frozen bytes
EXACTLY and the reader must parse them; this pins the wire format
independently of the writer/reader sharing bugs (they can no longer merely
self-round-trip)."""

import struct

import numpy as np

from pob_tpu.field.ref import FQ_MOD, FR_MOD, G1_GEN, g1_mul, g2_mul
from pob_tpu.prover import groth16, serialize
from pob_tpu.r1cs.builder import ConstraintSystem


def _sec(sid: int, body: bytes) -> bytes:
    return struct.pack("<iq", sid, len(body)) + body


def test_wtns_golden_bytes(tmp_path):
    """witness [1, 5, p-1] in wtns v2: magic, (version=2, nSections=2),
    section 1 = (n8=32, prime LE, count), section 2 = 32-byte LE values."""
    w = [1, 5, FR_MOD - 1]
    hdr = struct.pack("<I", 32) + FR_MOD.to_bytes(32, "little") + struct.pack("<I", 3)
    data = b"".join(v.to_bytes(32, "little") for v in w)
    golden = b"wtns" + struct.pack("<II", 2, 2) + _sec(1, hdr) + _sec(2, data)

    path = str(tmp_path / "g.wtns")
    serialize.write_wtns(path, w)
    assert open(path, "rb").read() == golden, "writer must emit the frozen layout"
    prime, vals = serialize.read_wtns(path)
    assert prime == FR_MOD and vals == w


def test_r1cs_golden_bytes(tmp_path):
    """1-public 2-wire system with one constraint  (2*w1) * (3*w1) = 6*w1:
    header section (n8, prime, nWires, nPubOut, nPubIn, nPrvIn, nLabels,
    mConstraints), constraint section ({nTerms, (wire, coeff)...} per matrix),
    wire2label section."""
    cs = ConstraintSystem()
    x = cs.alloc_block("x", (1,))
    cs.mark_public(1)
    cs.add([(int(x[0]), 2)], [(int(x[0]), 3)], [(int(x[0]), 6)])

    hdr = (
        struct.pack("<I", 32)
        + FR_MOD.to_bytes(32, "little")
        + struct.pack("<IIIIQI", 2, 1, 0, 0, 2, 1)
    )
    con = (
        struct.pack("<I", 1) + struct.pack("<I", 1) + (2).to_bytes(32, "little")
        + struct.pack("<I", 1) + struct.pack("<I", 1) + (3).to_bytes(32, "little")
        + struct.pack("<I", 1) + struct.pack("<I", 1) + (6).to_bytes(32, "little")
    )
    labels = struct.pack("<QQ", 0, 1)
    golden = b"r1cs" + struct.pack("<II", 1, 3) + _sec(1, hdr) + _sec(2, con) + _sec(3, labels)

    path = str(tmp_path / "g.r1cs")
    serialize.write_r1cs(path, cs)
    assert open(path, "rb").read() == golden, "writer must emit the frozen layout"
    d = serialize.read_r1cs(path)
    assert d["prime"] == FR_MOD
    assert d["num_wires"] == 2 and d["num_constraints"] == 1
    assert d["constraints"][0] == ({1: 2}, {1: 3}, {1: 6})


def test_zkey_header_golden_bytes(tmp_path):
    """Deterministic-toxic-waste zkey: the header section's field moduli,
    sizes, and the alpha1/beta1/beta2 points must appear at the documented
    offsets in LE *Montgomery* form (R = 2^256 mod q) — checked against
    independently computed curve points, not against the writer."""
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (1,))
    cs.mark_public(1)
    priv = cs.alloc_block("priv", (1,))
    cs.add([(int(priv[0]), 1)], [(int(priv[0]), 1)], [(int(pub[0]), 1)])

    seq = iter([3, 5, 7, 11, 13])  # tau, alpha, beta, gamma, delta
    pk, vk = groth16.setup(cs, rng=lambda: next(seq))
    path = str(tmp_path / "g.zkey")
    serialize.write_zkey(path, pk, vk, cs)

    data = open(path, "rb").read()
    assert data[:4] == b"zkey"
    version, nsec = struct.unpack_from("<II", data, 4)
    assert version == 1 and nsec == 10
    # walk sections independently
    off, sections = 12, {}
    for _ in range(nsec):
        sid, slen = struct.unpack_from("<iq", data, off)
        off += 12
        sections[sid] = data[off : off + slen]
        off += slen
    assert struct.unpack_from("<I", sections[1], 0)[0] == 1  # groth16
    hdr = sections[2]
    assert struct.unpack_from("<I", hdr, 0)[0] == 32
    assert int.from_bytes(hdr[4:36], "little") == FQ_MOD
    assert struct.unpack_from("<I", hdr, 36)[0] == 32
    assert int.from_bytes(hdr[40:72], "little") == FR_MOD
    nvars, npub, domain = struct.unpack_from("<III", hdr, 72)
    assert (nvars, npub) == (3, 1)
    assert domain == 1 << pk.k

    r_q = (1 << 256) % FQ_MOD

    def mont(v):
        return (v * r_q % FQ_MOD).to_bytes(32, "little")

    alpha1 = g1_mul(G1_GEN, 5)
    beta1 = g1_mul(G1_GEN, 7)
    assert hdr[84:116] == mont(alpha1[0]) and hdr[116:148] == mont(alpha1[1])
    assert hdr[148:180] == mont(beta1[0]) and hdr[180:212] == mont(beta1[1])
    from pob_tpu.field.ref import G2_GEN

    beta2 = g2_mul(G2_GEN, 7)
    (x0, x1), (y0, y1) = beta2
    assert hdr[212:340] == b"".join(mont(v) for v in (x0, x1, y0, y1))

    # IC section: npub+1 G1 points, 64 bytes each
    assert len(sections[3]) == 2 * 64
    # H section: domainSize G1 points
    assert len(sections[9]) == domain * 64

    # and the loaded key still proves
    pk2, vk2 = groth16.load_zkey(path)
    import jax.numpy as jnp

    from pob_tpu.field import limb

    proof = groth16.prove(pk2, limb.ints_to_limbs([1, 49, 7]), r=1, s=2)
    assert groth16.verify(vk2, proof, [49])
