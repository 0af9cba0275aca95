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
    w = [limb.limbs_to_int(buf[0, j]) for j in range(cs.num_wires)]
    assert w[1] == pob_expected_commitment(json.load(open(FIX)), TEST_CONFIG)
    assert cs.check_witness(w)


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
