"""Spend circuit integration tests (reference tests/testcases/spend.py):
recorded fixture, overdraw rejections, withdraw-everything."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.circuits.spend import SpendConfig, spend_forward
from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "spend_input.json")


def run_spend(cases):
    cfg = SpendConfig(31)
    arrs = {
        k: jnp.asarray(
            np.stack([limb.int_to_limbs(c[k] % (2**256)) for c in cases])
        )
        for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
    }
    fn = jax.jit(lambda **kw: spend_forward(cfg, **kw))
    out = fn(**arrs)
    return (
        np.asarray(out["commitment"]),
        np.asarray(out["valid"]),
    )


def test_spend_fixture_and_negatives():
    base = load_spend_input(FIX)
    overdraw = dict(base, withdrawn=base["balance"] + 1)
    huge = dict(base, withdrawn=2**240 - 1)
    withdraw_all = dict(base, withdrawn=base["balance"])

    commits, valid = run_spend([base, overdraw, huge, withdraw_all])

    assert valid[0]
    assert limb.limbs_to_int(commits[0]) == spend_expected_commitment(base)
    assert not valid[1], "overdraw by 1 must be rejected"
    assert not valid[2], "2^240-1 withdraw must be rejected"
    assert valid[3]
    assert limb.limbs_to_int(commits[3]) == spend_expected_commitment(withdraw_all)
