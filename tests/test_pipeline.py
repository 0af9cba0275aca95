"""Pipeline-parallel Groth16 proving (dist/pipeline.py) on the virtual
8-device CPU mesh: stage placement + streamed proofs must reproduce the
single-device prover's behavior (proofs verify, publics bind)."""

import jax
import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.prover import groth16
from pob_tpu.dist.pipeline import Groth16Pipeline

from test_groth16 import toy_cs, toy_witness


@pytest.fixture(scope="module")
def toy_pk_vk():
    return groth16.setup(toy_cs())


def _witness_fn(x, y):
    w, _ = toy_witness(x, y)
    return limb.ints_to_limbs(w)


def test_pipeline_stream_verifies(toy_pk_vk):
    pk, vk = toy_pk_vk
    reqs = [(3, 5), (123456, 789), (FR_MOD - 2, 7), (42, 42)]
    pipe = Groth16Pipeline(pk, _witness_fn, devices=jax.devices()[:3])
    proofs = pipe.prove_stream(reqs)
    assert len(proofs) == len(reqs)
    for (x, y), proof in zip(reqs, proofs):
        _, pub = toy_witness(x, y)
        assert groth16.verify(vk, proof, pub)
        assert not groth16.verify(vk, proof, [pub[0], (pub[1] + 1) % FR_MOD])


def test_pipeline_sharded_msm_group(toy_pk_vk):
    """MSM stage spread over several devices (pipeline x MSM-shard compose)."""
    pk, vk = toy_pk_vk
    pipe = Groth16Pipeline(pk, _witness_fn, devices=jax.devices()[:6])
    reqs = [(11, 13), (17, 19)]
    for (x, y), proof in zip(reqs, pipe.prove_stream(reqs)):
        _, pub = toy_witness(x, y)
        assert groth16.verify(vk, proof, pub)
