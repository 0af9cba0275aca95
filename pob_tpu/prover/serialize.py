"""Serialization compatible with the circom/snarkjs toolchain formats:
- .wtns binary witness files (the output format of the reference's generated
  C++ witness runtime, Makefile:5-6),
- snarkjs proof.json / public.json for Groth16 proofs.
"""

from __future__ import annotations

import json
import struct

from ..field.ref import FR_MOD

_WTNS_MAGIC = b"wtns"


def write_wtns(path: str, witness_ints, prime: int = FR_MOD):
    """Write a circom-format .wtns file (version 2, 32-byte LE field elems)."""
    n8 = 32
    n = len(witness_ints)
    with open(path, "wb") as f:
        f.write(_WTNS_MAGIC)
        f.write(struct.pack("<II", 2, 2))  # version, n_sections
        # section 1: header
        body1 = struct.pack("<I", n8) + prime.to_bytes(n8, "little") + struct.pack("<I", n)
        f.write(struct.pack("<iq", 1, len(body1)))
        f.write(body1)
        # section 2: data
        f.write(struct.pack("<iq", 2, n * n8))
        for v in witness_ints:
            f.write((int(v) % prime).to_bytes(n8, "little"))


def read_wtns(path: str):
    """Read a circom-format .wtns file -> (prime, [ints])."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == _WTNS_MAGIC, "bad wtns magic"
    version, n_sections = struct.unpack_from("<II", data, 4)
    off = 12
    prime = None
    n8 = 32
    count = 0
    values = []
    for _ in range(n_sections):
        sec_id, sec_len = struct.unpack_from("<iq", data, off)
        off += 12
        body = data[off : off + sec_len]
        off += sec_len
        if sec_id == 1:
            n8 = struct.unpack_from("<I", body, 0)[0]
            prime = int.from_bytes(body[4 : 4 + n8], "little")
            count = struct.unpack_from("<I", body, 4 + n8)[0]
        elif sec_id == 2:
            values = [
                int.from_bytes(body[i * n8 : (i + 1) * n8], "little")
                for i in range(len(body) // n8)
            ]
    assert len(values) == count
    return prime, values


def proof_to_snarkjs(proof) -> dict:
    """(A, B2, C) host affine points -> snarkjs proof.json dict."""
    a, b2, c = proof
    return {
        "pi_a": [str(a[0]), str(a[1]), "1"],
        "pi_b": [
            [str(b2[0][0]), str(b2[0][1])],
            [str(b2[1][0]), str(b2[1][1])],
            ["1", "0"],
        ],
        "pi_c": [str(c[0]), str(c[1]), "1"],
        "protocol": "groth16",
        "curve": "bn128",
    }


def snarkjs_to_proof(d: dict):
    a = (int(d["pi_a"][0]), int(d["pi_a"][1]))
    b2 = (
        (int(d["pi_b"][0][0]), int(d["pi_b"][0][1])),
        (int(d["pi_b"][1][0]), int(d["pi_b"][1][1])),
    )
    c = (int(d["pi_c"][0]), int(d["pi_c"][1]))
    return (a, b2, c)


def write_proof(path: str, proof, public_inputs):
    with open(path, "w") as f:
        json.dump(proof_to_snarkjs(proof), f, indent=1)
    with open(path.replace("proof", "public"), "w") as f:
        json.dump([str(x) for x in public_inputs], f, indent=1)
