"""Spend R1CS: the device-generated witness must satisfy every constraint,
and the public commitment wire must equal the golden commitment.

Set POB_RUN_SLOW=1 to also run the full Groth16 prove+verify on the Spend
system (heavy on CPU; the TPU bench covers it otherwise)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment
from pob_tpu.r1cs.spend_circuit import (
    assemble_witness,
    build_spend_cs,
    spend_witness,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "spend_input.json")


@pytest.fixture(scope="module")
def cs():
    return build_spend_cs()


def _witness_for(cases):
    arrs = [
        jnp.asarray(np.stack([limb.int_to_limbs(c[k] % FR_MOD) for c in cases]))
        for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
    ]
    return jax.jit(spend_witness)(*arrs)


def test_spend_witness_satisfies_constraints(cs):
    base = load_spend_input(FIX)
    withdraw_all = dict(base, withdrawn=base["balance"])
    blocks = _witness_for([base, withdraw_all])
    buf = np.asarray(assemble_witness(cs, blocks))

    for i, case in enumerate([base, withdraw_all]):
        w = limb.limb_rows_to_ints(buf[i])
        assert w[0] == 1
        assert w[1] == spend_expected_commitment(case), "public commitment wire"
        assert cs.check_witness(w), f"constraints violated for case {i}"


@pytest.mark.skipif(
    not os.environ.get("POB_RUN_SLOW"), reason="heavy: full Groth16 on Spend (TPU bench covers it)"
)
def test_spend_groth16_end_to_end(cs):
    from pob_tpu.prover import groth16

    base = load_spend_input(FIX)
    blocks = _witness_for([base])
    buf = np.asarray(assemble_witness(cs, blocks))[0]

    pk, vk = groth16.setup(cs)
    proof = groth16.prove(pk, buf)
    commitment = spend_expected_commitment(base)
    assert groth16.verify(vk, proof, [commitment])
    assert not groth16.verify(vk, proof, [(commitment + 1) % FR_MOD])
