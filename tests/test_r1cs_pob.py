"""ProofOfBurn R1CS: device witness must satisfy all constraints and expose
the golden commitment on the public wire.

Gated behind POB_RUN_SLOW — building the ~0.5M-constraint system takes
minutes on the 2-core CI host (it is cached per process)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("POB_RUN_SLOW"), reason="heavy: PoB R1CS build (~minutes)"
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "pob_input.json")


def _pob_witness_buf(cs):
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.harness.inputs import batch_stack, load_pob_input
    from pob_tpu.r1cs.pob_circuit import pob_r1cs_witness
    from pob_tpu.r1cs.spend_circuit import assemble_witness

    inp = load_pob_input(FIX, TEST_CONFIG)
    kw = {k: jnp.asarray(v) for k, v in batch_stack([inp]).items()}
    blocks = pob_r1cs_witness(TEST_CONFIG, **kw)
    return np.asarray(assemble_witness(cs, blocks))


def test_pob_r1cs_witness_satisfies_constraints():
    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.harness.inputs import pob_expected_commitment
    from pob_tpu.r1cs.pob_circuit import build_pob_cs

    cs = build_pob_cs(TEST_CONFIG)
    buf = _pob_witness_buf(cs)
    w = limb.limb_rows_to_ints(buf[0])
    assert w[1] == pob_expected_commitment(json.load(open(FIX)), TEST_CONFIG)
    assert cs.check_witness(w)


@pytest.fixture(scope="module")
def pob_cs_and_witness():
    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.r1cs.pob_circuit import build_pob_cs

    cs = build_pob_cs(TEST_CONFIG)
    buf = _pob_witness_buf(cs)
    w = limb.limb_rows_to_ints(buf[0])
    assert cs.check_witness(w), "canonical witness must pass"
    return cs, w


def _wire(cs, name, flat_index=0):
    for blk in cs.blocks:
        if blk.name == name:
            return blk.start + flat_index
    raise KeyError(name)


def _tampered(w, idx, value):
    from pob_tpu.field.ref import FR_MOD

    w2 = list(w)
    w2[idx] = value % FR_MOD
    return w2


def test_pob_tamper_substring_chain(pob_cs_and_witness):
    """Claiming the layer-1 digest exists in layer 0 at a different offset
    (flipping an `exists` bit of the polynomial substring check,
    substring_check.circom:77-95) must violate the CS."""
    cs, w = pob_cs_and_witness
    i = _wire(cs, "ss1_ex_out", 0)
    assert not cs.check_witness(_tampered(w, i, 1 - int(w[i])))


def test_pob_tamper_substring_sum(pob_cs_and_witness):
    """Faking the windowed existence sum (the wire that gates
    (1-ok)*exists === 0, proof_of_burn.circom:179)."""
    cs, w = pob_cs_and_witness
    blk = next(b for b in cs.blocks if b.name == "ss1_sums")
    i = blk.start + blk.shape[0] - 1  # final sum feeds the dz IsZero
    assert not cs.check_witness(_tampered(w, i, int(w[i]) + 1))


def test_pob_tamper_leaf_detector(pob_cs_and_witness):
    """Flipping a LeafDetector AND-chain bit (merkle_patricia_trie_leaf.
    circom:289-293) breaks either the chain or numDetectedLeaves === 1."""
    cs, w = pob_cs_and_witness
    for name in ("ld0_and", "ld1_and"):
        blk = next(b for b in cs.blocks if b.name == name)
        i = blk.start + blk.shape[0] - 1  # the isLeaf output bit
        assert not cs.check_witness(_tampered(w, i, 1 - int(w[i])))


def test_pob_tamper_pow_filter(pob_cs_and_witness):
    """Zeroing the PoW prefix filter (proof_of_work.circom:73-80) to skip the
    leading-zero-byte requirement must be rejected."""
    cs, w = pob_cs_and_witness
    i = _wire(cs, "pw_filt", 0)
    assert int(w[i]) == 1  # 2 zero bytes required at TEST_CONFIG
    assert not cs.check_witness(_tampered(w, i, 0))


def test_pob_tamper_layer_existence(pob_cs_and_witness):
    """Faking the layer-existence gate (Filter(maxNumLayers)(numLayers),
    proof_of_burn.circom:150) that turns off the substring chain."""
    cs, w = pob_cs_and_witness
    blk = next(b for b in cs.blocks if b.name == "nl_filt")
    for j in range(blk.shape[0]):
        i = blk.start + j
        assert not cs.check_witness(_tampered(w, i, 1 - int(w[i])))


def test_pob_corrupted_layers_cs():
    """Input-level fault injection at the CS layer (the reference's
    testcases/proof_of_burn.py:41-75): corrupting byte 0 of used layers 0/1
    must make the honestly regenerated witness violate the system; corrupting
    unused layer 3 must still satisfy it."""
    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.harness.inputs import batch_stack, load_pob_input
    from pob_tpu.r1cs.pob_circuit import build_pob_cs, pob_r1cs_witness
    from pob_tpu.r1cs.spend_circuit import assemble_witness

    cs = build_pob_cs(TEST_CONFIG)
    base = load_pob_input(FIX, TEST_CONFIG)
    variants = []
    for li in (0, 1, 3):
        v = dict(base)
        layers = np.array(v["layers"])
        layers[li, 0] ^= 0xFF
        v["layers"] = layers
        variants.append(v)
    kw = {k: jnp.asarray(v) for k, v in batch_stack(variants).items()}
    buf = np.asarray(assemble_witness(cs, pob_r1cs_witness(TEST_CONFIG, **kw)))
    expected_ok = [False, False, True]
    for bi, ok in enumerate(expected_ok):
        w = limb.limb_rows_to_ints(buf[bi])
        assert cs.check_witness(w) == ok, f"variant {bi}: expected ok={ok}"


def test_pob_groth16_end_to_end():
    """Full Groth16 on the ProofOfBurn (TEST_CONFIG) system: setup over the
    ~8e5-constraint CS, batched device witness, prove, pairing-verify — the
    flagship circuit through the whole proving stack (the stage the reference
    delegates to snarkjs/rapidsnark, Makefile:5-6)."""
    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.harness.inputs import pob_expected_commitment
    from pob_tpu.prover import groth16
    from pob_tpu.r1cs.pob_circuit import build_pob_cs

    cs = build_pob_cs(TEST_CONFIG)
    buf = _pob_witness_buf(cs)[0]

    pk, vk = groth16.setup(cs)
    proof = groth16.prove(pk, buf)
    commitment = pob_expected_commitment(json.load(open(FIX)), TEST_CONFIG)
    assert groth16.verify(vk, proof, [commitment])
    assert not groth16.verify(vk, proof, [(commitment + 1) % FR_MOD])
