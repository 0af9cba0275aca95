"""ProofOfBurn integration tests (reference tests/testcases/proof_of_burn.py):
the recorded fixture must produce the golden commitment; corrupting used
layers must reject; corrupting unused layers must still pass."""

import copy
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from pob_tpu.field import limb
from pob_tpu.circuits.proof_of_burn import PoBConfig, pob_forward
from pob_tpu.harness.inputs import (
    batch_stack,
    load_pob_input,
    pob_expected_commitment,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "pob_input.json")
CFG = PoBConfig(4, 4, 5, 20, 31, 2, 10**18, 10**19)  # test instantiation


def test_pob_fixture_and_fault_injection():
    base = json.load(open(FIX))
    variants = [base]
    for i in range(4):
        v = copy.deepcopy(base)
        v["layers"][i][0] += 1
        variants.append(v)

    kwargs = batch_stack([load_pob_input(v, CFG) for v in variants])
    fn = jax.jit(lambda **kw: pob_forward(CFG, **kw))
    out = fn(**{k: jnp.asarray(v) for k, v in kwargs.items()})
    commits = np.asarray(out["commitment"])
    valid = np.asarray(out["valid"])

    expected = pob_expected_commitment(base, CFG)
    assert valid[0], "fixture must validate"
    assert limb.limbs_to_int(commits[0]) == expected
    assert not valid[1], "corrupted layer 0 must reject"
    assert not valid[2], "corrupted layer 1 must reject"
    assert valid[3], "layer 2 is unused, corruption is harmless"
    assert valid[4], "layer 3 is unused, corruption is harmless"
    assert limb.limbs_to_int(commits[3]) == expected
