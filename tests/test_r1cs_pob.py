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


def test_pob_r1cs_witness_satisfies_constraints():
    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.harness.inputs import batch_stack, load_pob_input, pob_expected_commitment
    from pob_tpu.r1cs.pob_circuit import build_pob_cs, pob_r1cs_witness
    from pob_tpu.r1cs.spend_circuit import assemble_witness

    cs = build_pob_cs(TEST_CONFIG)
    inp = load_pob_input(FIX, TEST_CONFIG)
    kw = {k: jnp.asarray(v) for k, v in batch_stack([inp]).items()}
    blocks = pob_r1cs_witness(TEST_CONFIG, **kw)
    buf = np.asarray(assemble_witness(cs, blocks))
    w = [limb.limbs_to_int(buf[0, j]) for j in range(cs.num_wires)]
    assert w[1] == pob_expected_commitment(json.load(open(FIX)), TEST_CONFIG)
    assert cs.check_witness(w)
