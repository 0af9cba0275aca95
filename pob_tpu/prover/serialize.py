"""Serialization compatible with the circom/snarkjs toolchain formats:
- .wtns binary witness files (the output format of the reference's generated
  C++ witness runtime, Makefile:5-6),
- .r1cs binary constraint systems (the format `circom -c` emits and snarkjs
  consumes for Groth16 setup, SURVEY.md §2.8),
- snarkjs proof.json / public.json for Groth16 proofs.
"""

from __future__ import annotations

import json
import struct

from ..field.ref import FR_MOD

_WTNS_MAGIC = b"wtns"
_R1CS_MAGIC = b"r1cs"


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


def write_r1cs(path: str, cs, prime: int = FR_MOD):
    """Write a ConstraintSystem as a circom/snarkjs binary .r1cs file
    (format version 1: header, constraints, wire2label sections) so the
    emitted system can be consumed by the stock snarkjs Groth16 pipeline —
    the reference's downstream prover (SURVEY.md §2.8, circuitscan.yml:27-39).

    Public wires are recorded as public *outputs* (nPubOut), matching how the
    circuits expose a single `commitment` output (proof_of_burn.circom:40)."""
    n8 = 32
    nw = cs.num_wires
    npub = cs.num_public

    def coeff_bytes(c: int) -> bytes:
        return (c % prime).to_bytes(n8, "little")

    # group COO terms by constraint row for each matrix
    mats = []
    for coo in cs.matrices():
        rows, cols, coeffs = coo
        order = None
        import numpy as np

        order = np.argsort(rows, kind="stable")
        rows = rows[order]
        cols = cols[order]
        coeffs = [coeffs[i] for i in order]
        starts = np.searchsorted(rows, np.arange(cs.num_constraints))
        ends = np.searchsorted(rows, np.arange(cs.num_constraints), side="right")
        mats.append((cols, coeffs, starts, ends))

    body = bytearray()
    for r in range(cs.num_constraints):
        for cols, coeffs, starts, ends in mats:
            s, e = int(starts[r]), int(ends[r])
            body += struct.pack("<I", e - s)
            for i in range(s, e):
                body += struct.pack("<I", int(cols[i]))
                body += coeff_bytes(coeffs[i])

    with open(path, "wb") as f:
        f.write(_R1CS_MAGIC)
        f.write(struct.pack("<II", 1, 3))  # version, n_sections
        header = (
            struct.pack("<I", n8)
            + prime.to_bytes(n8, "little")
            + struct.pack("<IIIIQI", nw, npub, 0, nw - 1 - npub, nw, cs.num_constraints)
        )
        f.write(struct.pack("<iq", 1, len(header)))
        f.write(header)
        f.write(struct.pack("<iq", 2, len(body)))
        f.write(body)
        labels = b"".join(struct.pack("<Q", i) for i in range(nw))
        f.write(struct.pack("<iq", 3, len(labels)))
        f.write(labels)


def read_r1cs(path: str):
    """Read a circom/snarkjs .r1cs -> dict with prime, counts, and
    constraints as a list of (A, B, C) term dicts {wire: coeff}."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == _R1CS_MAGIC, "bad r1cs magic"
    _version, n_sections = struct.unpack_from("<II", data, 4)
    off = 12
    sections = {}
    for _ in range(n_sections):
        sec_id, sec_len = struct.unpack_from("<iq", data, off)
        off += 12
        sections[sec_id] = data[off : off + sec_len]
        off += sec_len
    hdr = sections[1]
    n8 = struct.unpack_from("<I", hdr, 0)[0]
    prime = int.from_bytes(hdr[4 : 4 + n8], "little")
    nw, npubout, npubin, nprvin, nlabels, ncons = struct.unpack_from(
        "<IIIIQI", hdr, 4 + n8
    )
    body = sections[2]
    pos = 0
    constraints = []
    for _ in range(ncons):
        terms = []
        for _m in range(3):
            (cnt,) = struct.unpack_from("<I", body, pos)
            pos += 4
            d = {}
            for _t in range(cnt):
                (wire,) = struct.unpack_from("<I", body, pos)
                pos += 4
                d[wire] = int.from_bytes(body[pos : pos + n8], "little")
                pos += n8
            terms.append(d)
        constraints.append(tuple(terms))
    return {
        "prime": prime,
        "num_wires": nw,
        "num_public_out": npubout,
        "num_public_in": npubin,
        "num_constraints": ncons,
        "constraints": constraints,
    }


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


def vk_to_snarkjs(vk) -> dict:
    """VerifyingKey -> snarkjs verification_key.json dict (groth16/bn128).

    Emits the group elements snarkjs' groth16 verifier actually consumes
    (vk_alpha_1/vk_beta_2/vk_gamma_2/vk_delta_2/IC); the redundant
    precomputed vk_alphabeta_12 field is omitted."""

    def enc1(p):
        return [str(p[0]), str(p[1]), "1"]

    def enc2(p):
        return [
            [str(p[0][0]), str(p[0][1])],
            [str(p[1][0]), str(p[1][1])],
            ["1", "0"],
        ]

    return {
        "protocol": "groth16",
        "curve": "bn128",
        "nPublic": len(vk.ic) - 1,
        "vk_alpha_1": enc1(vk.alpha1),
        "vk_beta_2": enc2(vk.beta2),
        "vk_gamma_2": enc2(vk.gamma2),
        "vk_delta_2": enc2(vk.delta2),
        "IC": [enc1(p) for p in vk.ic],
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
