"""Solidity verifier export (pob_tpu/prover/solidity.py).

The reference deploys a Groth16 Solidity verifier on-chain via circuitscan
(/root/reference/.github/workflows/circuitscan.yml:27-39); these tests pin
our native equivalent: the generated contract embeds the verification key
faithfully (round-trip extraction), uses the EIP-196/197 precompiles, and
the calldata encoder emits EIP-197 G2 limb order (imaginary first).

No solc/EVM exists in this sandbox, so the contract is validated
structurally + by constant round-trip, not by execution.
"""

import re

from pob_tpu.field.ref import FQ_MOD, FR_MOD
from pob_tpu.prover import groth16
from pob_tpu.prover.solidity import (
    parse_solidity_vk,
    proof_to_calldata,
    vk_to_solidity,
)
from pob_tpu.r1cs.builder import ConstraintSystem


def _tiny_vk():
    # x * y = pub (1 public output): smallest useful system
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (1,))
    cs.mark_public(1)
    priv = cs.alloc_block("priv", (2,))
    cs.add([(int(priv[0]), 1)], [(int(priv[1]), 1)], [(int(pub[0]), 1)])
    rnd = __import__("random").Random(7)
    _pk, vk = groth16.setup_host(cs, rng=lambda: rnd.randrange(1, FR_MOD))
    return vk


def test_solidity_vk_round_trip():
    vk = _tiny_vk()
    src = vk_to_solidity(vk, "TestVerifier")
    consts, (alpha1, beta2, gamma2, delta2, ic) = parse_solidity_vk(src)
    assert alpha1 == vk.alpha1
    assert beta2 == vk.beta2
    assert gamma2 == vk.gamma2
    assert delta2 == vk.delta2
    assert ic == list(vk.ic)
    assert consts["r"] == FR_MOD and consts["q"] == FQ_MOD


def test_solidity_structure():
    vk = _tiny_vk()
    src = vk_to_solidity(vk)
    assert "contract Groth16Verifier" in src
    assert "pragma solidity" in src
    # the three precompiles: pairing (8), ecMul (7), ecAdd (6)
    for pc in (8, 7, 6):
        assert re.search(rf"staticcall\(gas\(\), {pc},", src), f"precompile {pc}"
    # one ecMul+ecAdd fold step per public input
    n_public = len(vk.ic) - 1
    assert src.count("staticcall(gas(), 7,") == n_public
    assert f"uint256 constant nPublic = {n_public};" in src
    # scalar-field range check on every public input
    assert src.count("revert PublicInputNotInField") == n_public
    # A is negated for the pairing (the -A in e(-A,B)); y==0 guards infinity
    assert "q - (proof[1] % q)" in src
    # pairing input layout: beta/gamma/delta imaginary limb (x1) first
    for name in ("beta", "gamma", "delta"):
        i1 = src.index(f"{name}x1;")
        i0 = src.index(f"{name}x0;")
        assert i1 < i0, f"{name} G2 x limbs must be imaginary-first (EIP-197)"


def test_proof_calldata_encoding():
    a = (11, 22)
    b2 = ((31, 32), (41, 42))  # ((x_c0, x_c1), (y_c0, y_c1))
    c = (51, 52)
    cd = proof_to_calldata((a, b2, c), [7, FR_MOD + 5])
    proof_part, input_part = cd.split("],[")
    words = re.findall(r'"0x([0-9a-f]{64})"', proof_part)
    assert [int(w, 16) for w in words] == [11, 22, 32, 31, 42, 41, 51, 52]
    pubs = re.findall(r'"0x([0-9a-f]{64})"', input_part)
    assert [int(w, 16) for w in pubs] == [7, 5]  # reduced mod r


def test_cli_export_verifier(tmp_path):
    import json

    from pob_tpu.cli import main
    from pob_tpu.prover import serialize

    vk = _tiny_vk()
    vk_path = tmp_path / "vk.json"
    vk_path.write_text(json.dumps(serialize.vk_to_snarkjs(vk)))
    out = tmp_path / "verifier.sol"
    rc = main(["export-verifier", "--vk", str(vk_path), "--out", str(out),
               "--name", "PobVerifier"])
    assert rc == 0
    src = out.read_text()
    assert "contract PobVerifier" in src
    _, (alpha1, beta2, gamma2, delta2, ic) = parse_solidity_vk(src)
    assert (alpha1, beta2, gamma2, delta2, ic) == (
        vk.alpha1, vk.beta2, vk.gamma2, vk.delta2, list(vk.ic))


def test_solidity_multi_public_ic_fold():
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (3,))
    cs.mark_public(3)
    priv = cs.alloc_block("priv", (2,))
    for i in range(3):
        cs.add([(int(priv[0]), i + 1)], [(int(priv[1]), 1)], [(int(pub[i]), 1)])
    rnd = __import__("random").Random(3)
    _pk, vk = groth16.setup_host(cs, rng=lambda: rnd.randrange(1, FR_MOD))
    src = vk_to_solidity(vk)
    _, (_, _, _, _, ic) = parse_solidity_vk(src)
    assert len(ic) == 4 and ic == list(vk.ic)
    # fold references every IC point and every input index
    for i in range(3):
        assert f"input[{i}]" in src and f"IC{i + 1}x" in src
