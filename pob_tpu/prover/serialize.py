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


# ---------------------------------------------------------------------------
# snarkjs .zkey (Groth16 proving key) — binary format compatibility
# ---------------------------------------------------------------------------
#
# Layout (zkey version 1, protocol groth16), all integers LE, field elements
# stored as n8-byte LE *Montgomery* representations (R = 2^256):
#   section 1: prover type (u32 = 1)
#   section 2: n8q, q, n8r, r, nVars, nPublic, domainSize,
#              alpha1 beta1 (G1) beta2 gamma2 (G2) delta1 (G1) delta2 (G2)
#   section 3: IC            (nPublic+1 G1)
#   section 4: coefficients  u32 count, then {u32 m, u32 c, u32 s, Fr value}
#   section 5: A points      (nVars G1)
#   section 6: B1 points     (nVars G1)
#   section 7: B2 points     (nVars G2)
#   section 8: C points      (nVars - nPublic - 1 G1)
#   section 9: H points      (domainSize G1, coset-Lagrange basis)
#   section 10: contributions (empty)
# The H basis and the A-matrix public-binding rows follow the snarkjs
# conventions documented in prover/groth16.py.

_ZKEY_MAGIC = b"zkey"


class ZkeyFormatError(ValueError):
    """A .zkey file is structurally inconsistent (truncated, wrong field
    widths, section sizes contradicting header counts). Raised instead of
    misparsing: a proving key silently built from a misread layout would
    produce unverifiable proofs far downstream of the actual bug."""


def _mont_bytes_fq(v: int) -> bytes:
    from ..field.ref import FQ_MOD

    return (v * ((1 << 256) % FQ_MOD) % FQ_MOD).to_bytes(32, "little")


def _g1_bytes(pt) -> bytes:
    if pt is None:
        return b"\0" * 64
    return _mont_bytes_fq(pt[0]) + _mont_bytes_fq(pt[1])


def _g2_bytes(pt) -> bytes:
    if pt is None:
        return b"\0" * 128
    (x0, x1), (y0, y1) = pt
    return b"".join(_mont_bytes_fq(v) for v in (x0, x1, y0, y1))


def _limb_arr_bytes(a) -> bytes:
    """(m, ..., 16) uint32 Montgomery limb array -> packed LE bytes."""
    import numpy as np

    return np.ascontiguousarray(np.asarray(a)).astype("<u2").tobytes()


def _device_g1_section(points, chunk: int = 1 << 17) -> bytes:
    """Device Jacobian G1 batch -> zkey G1 point bytes (affine Montgomery)."""
    import numpy as np

    from . import curve

    m = int(points[0].shape[0])
    out = []
    for i in range(0, m, chunk):
        p = tuple(c[i : i + chunk] for c in points)
        x, y, _inf = curve.affine_mont_batch("fq", p)
        xy = np.stack([np.asarray(x), np.asarray(y)], axis=1)  # (c, 2, 16)
        out.append(_limb_arr_bytes(xy))
    return b"".join(out)


def _device_g2_section(points, chunk: int = 1 << 16) -> bytes:
    import numpy as np

    from . import curve

    m = int(points[0].shape[0])
    out = []
    for i in range(0, m, chunk):
        p = tuple(c[i : i + chunk] for c in points)
        x, y, _inf = curve.affine_mont_batch("fq2", p)
        xy = np.concatenate([np.asarray(x), np.asarray(y)], axis=1)  # (c, 4, 16)
        out.append(_limb_arr_bytes(xy))
    return b"".join(out)


def write_zkey(path: str, pk, vk, cs):
    """Write a snarkjs-format Groth16 .zkey from a ProvingKey/VerifyingKey
    produced by groth16.setup (whose H basis and coefficient layout follow the
    snarkjs conventions, so a stock snarkjs prover can consume the file)."""
    from ..field.ref import FQ_MOD
    from .groth16 import snarkjs_matrices

    _R_FR = (1 << 256) % FR_MOD
    nvars = cs.num_wires
    npub = cs.num_public
    n8 = 32

    mat_a, mat_b = snarkjs_matrices(cs)
    coeff_body = [struct.pack("<I", sum(len(m[2]) for m in (mat_a, mat_b)))]
    for midx, (rows, cols, coeffs) in enumerate((mat_a, mat_b)):
        for r, c_, v in zip(rows, cols, coeffs):
            coeff_body.append(struct.pack("<III", midx, int(r), int(c_)))
            coeff_body.append((int(v) * _R_FR % FR_MOD).to_bytes(n8, "little"))

    header = (
        struct.pack("<I", n8)
        + FQ_MOD.to_bytes(n8, "little")
        + struct.pack("<I", n8)
        + FR_MOD.to_bytes(n8, "little")
        + struct.pack("<III", nvars, npub, 1 << pk.k)
        + _g1_bytes(pk.alpha1)
        + _g1_bytes(pk.beta1)
        + _g2_bytes(pk.beta2)
        + _g2_bytes(vk.gamma2)
        + _g1_bytes(pk.delta1)
        + _g2_bytes(pk.delta2)
    )

    sections = [
        (1, struct.pack("<I", 1)),
        (2, header),
        (3, b"".join(_g1_bytes(p) for p in vk.ic)),
        (4, b"".join(coeff_body)),
        (5, _device_g1_section(pk.a_query)),
        (6, _device_g1_section(pk.b1_query)),
        (7, _device_g2_section(pk.b2_query)),
        (8, _device_g1_section(pk.l_query)),
        (9, _device_g1_section(pk.h_query)),
        (10, b""),
    ]
    with open(path, "wb") as f:
        f.write(_ZKEY_MAGIC)
        f.write(struct.pack("<II", 1, len(sections)))
        for sid, body in sections:
            f.write(struct.pack("<iq", sid, len(body)))
            f.write(body)


def read_zkey(path: str) -> dict:
    """Parse a snarkjs Groth16 .zkey -> raw materials: header ints, canonical
    host points for the small elements, and Montgomery limb arrays (numpy
    uint32 (m, ..., 16)) for the big query sections."""
    import numpy as np

    from ..field.ref import FQ_MOD

    rinv_q = pow((1 << 256) % FQ_MOD, FQ_MOD - 2, FQ_MOD)
    rinv_r = pow((1 << 256) % FR_MOD, FR_MOD - 2, FR_MOD)

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _ZKEY_MAGIC:
        raise ZkeyFormatError("bad zkey magic")
    if len(data) < 12:
        raise ZkeyFormatError("truncated zkey: no section table")
    _version, n_sections = struct.unpack_from("<II", data, 4)
    off = 12
    sections = {}
    for _ in range(n_sections):
        if off + 12 > len(data):
            raise ZkeyFormatError("truncated zkey: section header cut short")
        sid, slen = struct.unpack_from("<iq", data, off)
        off += 12
        if slen < 0 or off + slen > len(data):
            raise ZkeyFormatError(
                f"truncated zkey: section {sid} claims {slen} bytes, "
                f"{len(data) - off} remain"
            )
        sections[sid] = data[off : off + slen]
        off += slen
    missing = [s for s in range(1, 10) if s not in sections]
    if missing:
        raise ZkeyFormatError(f"zkey missing sections {missing}")

    if len(sections[1]) < 4:
        raise ZkeyFormatError("zkey section 1 too short")
    (proto,) = struct.unpack_from("<I", sections[1], 0)
    if proto != 1:
        raise ZkeyFormatError("not a groth16 zkey")
    hdr = sections[2]
    if len(hdr) < 8:
        raise ZkeyFormatError("zkey header too short")
    pos = 0
    (n8q,) = struct.unpack_from("<I", hdr, pos); pos += 4
    if n8q != 32:
        raise ZkeyFormatError(f"unsupported n8q={n8q} (expected 32)")
    q = int.from_bytes(hdr[pos : pos + n8q], "little"); pos += n8q
    if len(hdr) < pos + 4:
        raise ZkeyFormatError("zkey header too short")
    (n8r,) = struct.unpack_from("<I", hdr, pos); pos += 4
    if n8r != 32:
        raise ZkeyFormatError(f"unsupported n8r={n8r} (expected 32)")
    r = int.from_bytes(hdr[pos : pos + n8r], "little"); pos += n8r
    if len(hdr) < pos + 12 + 3 * 64 + 3 * 128:
        raise ZkeyFormatError("zkey header too short for group elements")
    nvars, npub, domain = struct.unpack_from("<III", hdr, pos); pos += 12
    if q != FQ_MOD:
        raise ZkeyFormatError("zkey base-field prime is not BN254 Fq")
    if r != FR_MOD:
        raise ZkeyFormatError("zkey scalar-field prime is not BN254 Fr")

    def fq(b):
        return int.from_bytes(b, "little") * rinv_q % FQ_MOD

    def g1(buf, i):
        x = fq(buf[i * 64 : i * 64 + 32])
        y = fq(buf[i * 64 + 32 : i * 64 + 64])
        return None if x == 0 and y == 0 else (x, y)

    def g2(buf, i):
        v = [fq(buf[i * 128 + 32 * j : i * 128 + 32 * (j + 1)]) for j in range(4)]
        if all(c == 0 for c in v):
            return None
        return ((v[0], v[1]), (v[2], v[3]))

    alpha1 = g1(hdr[pos:], 0); pos += 64
    beta1 = g1(hdr[pos:], 0); pos += 64
    beta2 = g2(hdr[pos:], 0); pos += 128
    gamma2 = g2(hdr[pos:], 0); pos += 128
    delta1 = g1(hdr[pos:], 0); pos += 64
    delta2 = g2(hdr[pos:], 0); pos += 128

    # point-section sizes must match the header counts exactly — a mismatch
    # means either truncation or a layout misunderstanding; silently
    # reshaping to "whatever fits" would misattribute points to wires
    expected = {
        3: (npub + 1) * 64,
        5: nvars * 64,
        6: nvars * 64,
        7: nvars * 128,
        8: max(0, nvars - npub - 1) * 64,
        9: domain * 64,
    }
    for sid, want in expected.items():
        if len(sections[sid]) != want:
            raise ZkeyFormatError(
                f"zkey section {sid} is {len(sections[sid])} bytes, header "
                f"counts imply {want}"
            )

    ic = [g1(sections[3], i) for i in range(len(sections[3]) // 64)]

    cb = sections[4]
    if len(cb) < 4:
        raise ZkeyFormatError("zkey coefficient section too short")
    (ncoef,) = struct.unpack_from("<I", cb, 0)
    if len(cb) != 4 + ncoef * 44:
        raise ZkeyFormatError(
            f"zkey coefficient section is {len(cb)} bytes, count {ncoef} "
            f"implies {4 + ncoef * 44}"
        )
    pos4 = 4
    coeffs = {0: ([], [], []), 1: ([], [], [])}
    for _ in range(ncoef):
        m, c_, s = struct.unpack_from("<III", cb, pos4)
        pos4 += 12
        if m not in (0, 1):
            raise ZkeyFormatError(f"zkey coefficient names matrix {m}")
        if c_ >= domain + npub + 1 or s >= nvars:
            raise ZkeyFormatError(
                f"zkey coefficient out of range: row {c_}, wire {s}"
            )
        v = int.from_bytes(cb[pos4 : pos4 + 32], "little") * rinv_r % FR_MOD
        pos4 += 32
        coeffs[m][0].append(c_)
        coeffs[m][1].append(s)
        coeffs[m][2].append(v)

    def limbs(buf, per_point):
        a = np.frombuffer(buf, "<u2").astype(np.uint32)
        return a.reshape(-1, per_point, 16)

    return {
        "n_vars": nvars,
        "n_public": npub,
        "domain_size": domain,
        "alpha1": alpha1, "beta1": beta1, "beta2": beta2,
        "gamma2": gamma2, "delta1": delta1, "delta2": delta2,
        "ic": ic,
        "coeffs": coeffs,  # {matrix: (rows, cols, canonical values)}
        "a_pts": limbs(sections[5], 2),
        "b1_pts": limbs(sections[6], 2),
        "b2_pts": limbs(sections[7], 4),
        "c_pts": limbs(sections[8], 2),
        "h_pts": limbs(sections[9], 2),
    }


def snarkjs_to_vk(d: dict):
    """snarkjs verification_key.json dict -> VerifyingKey."""
    from .groth16 import VerifyingKey

    def dec1(v):
        return (int(v[0]), int(v[1]))

    def dec2(v):
        return ((int(v[0][0]), int(v[0][1])), (int(v[1][0]), int(v[1][1])))

    return VerifyingKey(
        alpha1=dec1(d["vk_alpha_1"]),
        beta2=dec2(d["vk_beta_2"]),
        gamma2=dec2(d["vk_gamma_2"]),
        delta2=dec2(d["vk_delta_2"]),
        ic=[dec1(p) for p in d["IC"]],
    )
