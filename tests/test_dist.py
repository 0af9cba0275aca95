"""Multi-device sharding tests on the 8-device virtual CPU mesh: results must
be invariant to mesh sharding (SURVEY.md §4.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD, G1_GEN, g1_add, g1_mul
from pob_tpu.dist.mesh import data_mesh
from pob_tpu.dist.msm_sharded import msm_g1_sharded
from pob_tpu.dist.ntt_sharded import ntt_sharded, untranspose_host
from pob_tpu.prover import curve, ntt

_R = (1 << 256) % FR_MOD


def test_msm_sharded_matches_ref():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = data_mesh(8)
    m = 16
    scalars = [(i * 37 + 5) % FR_MOD for i in range(m)]
    pts = [g1_mul(G1_GEN, i + 3) for i in range(m)]
    out = msm_g1_sharded(mesh, curve.g1_points_to_device(pts),
                         jnp.asarray(limb.ints_to_limbs(scalars)))
    expect = None
    for s, p in zip(scalars, pts):
        expect = g1_add(expect, g1_mul(p, s))
    assert curve.to_affine_host("fq", out) == expect


def test_ntt_sharded_matches_local():
    mesh = data_mesh(8)
    k1 = k2 = 3
    n = 1 << (k1 + k2)
    coeffs = [(i * 7919 + 13) % FR_MOD for i in range(n)]
    a = jnp.asarray(limb.ints_to_limbs([c * _R % FR_MOD for c in coeffs]))
    c_out = ntt_sharded(mesh, a, k1, k2)
    x = untranspose_host(c_out)
    local = np.asarray(ntt.ntt(a, k1 + k2))
    assert np.array_equal(x, local)


def _medium_cs(n_mul: int = 58):
    """x, y secret; chain w_{i+1} = w_i * w_i; publics [z1, z2]. Enough
    constraints for a 2^6 domain so the sharded h pipeline 2D-decomposes over
    8 devices (needs 2^k1 and 2^k2 divisible by the mesh size)."""
    from pob_tpu.r1cs.builder import ConstraintSystem

    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (2,))
    cs.mark_public(2)
    priv = cs.alloc_block("priv", (2,))
    chain = cs.alloc_block("chain", (n_mul,))
    x, y = int(priv[0]), int(priv[1])
    cs.add([(x, 1)], [(y, 1)], [(int(chain[0]), 1)])
    for i in range(1, n_mul):
        cs.add([(int(chain[i - 1]), 1)], [(int(chain[i - 1]), 1)],
               [(int(chain[i]), 1)])
    cs.add([(int(chain[n_mul - 1]), 1)], [(x, 1)], [(int(pub[0]), 1)])
    cs.add([(int(chain[n_mul - 1]), 1)], [(y, 1)], [(int(pub[1]), 1)])
    return cs


def _medium_witness(x: int, y: int, n_mul: int = 58):
    chain = [x * y % FR_MOD]
    for _ in range(1, n_mul):
        chain.append(chain[-1] * chain[-1] % FR_MOD)
    z1 = chain[-1] * x % FR_MOD
    z2 = chain[-1] * y % FR_MOD
    return [1, z1, z2, x, y] + chain, [z1, z2]


def test_prove_sharded_mesh_invariant():
    """One Groth16 proof computed across the mesh (point-sharded MSMs +
    all_to_all four-step h pipeline, dist/prove_sharded.py) must equal the
    single-device prover's proof bit-for-bit at fixed blinding (r, s), for
    every mesh size — and pairing-verify."""
    from pob_tpu.dist.prove_sharded import prove_sharded, shard_pk
    from pob_tpu.prover import groth16

    cs = _medium_cs()
    pk, vk = groth16.setup(cs)
    w, pub = _medium_witness(31415, 92653)
    assert cs.check_witness(w)
    witness = limb.ints_to_limbs(w)
    reference = groth16.prove(pk, witness, r=1234, s=5678)
    assert groth16.verify(vk, reference, pub)

    for nd in (1, 2, 8):
        spk = shard_pk(pk, data_mesh(nd))
        proof = prove_sharded(spk, witness, r=1234, s=5678)
        assert proof == reference, f"mesh size {nd} must reproduce the proof"
    assert not groth16.verify(vk, reference, [pub[0], (pub[1] + 1) % FR_MOD])


def test_compute_h_sharded_matches_local():
    """The sharded h pipeline (inverse four-step -> coset scale -> forward
    four-step, permuted layout) must agree elementwise with the local
    compute_h under the key's permutation."""
    from pob_tpu.dist.prove_sharded import compute_h_sharded, shard_pk
    from pob_tpu.prover import groth16

    cs = _medium_cs()
    pk, _vk = groth16.setup(cs)
    w, _pub = _medium_witness(7, 11)
    witness = jnp.asarray(limb.ints_to_limbs(w))
    local = np.asarray(groth16.compute_h(pk, witness))
    spk = shard_pk(pk, data_mesh(8))
    sharded = np.asarray(compute_h_sharded(spk, witness))
    n1, n2 = 1 << spk.k1, 1 << spk.k2
    q = np.arange(1 << pk.k)
    perm = (q % n1) * n2 + q // n1
    assert np.array_equal(sharded, local[perm])


def test_dryrun_entrypoints():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert bool(np.asarray(out[1]).all())
    ge.dryrun_multichip(8)


def test_init_multihost_wires_jax_distributed(monkeypatch):
    """init_multihost (SURVEY.md §5.8): env-driven DCN process-group bring-up
    must pass the launcher configuration through to jax.distributed.initialize
    exactly once, and be a no-op without a coordinator."""
    from pob_tpu.dist import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    # no coordinator anywhere -> no-op
    monkeypatch.delenv("POB_COORDINATOR", raising=False)
    assert mesh_mod.init_multihost() is None
    assert calls == []
    # explicit args
    info = mesh_mod.init_multihost("host0:1234", num_processes=4, process_id=2)
    assert calls[-1] == {
        "coordinator_address": "host0:1234", "num_processes": 4, "process_id": 2,
    }
    assert info["coordinator"] == "host0:1234"
    assert info["global_devices"] == len(jax.devices())
    # env-driven (the launcher convention)
    monkeypatch.setenv("POB_COORDINATOR", "host9:999")
    monkeypatch.setenv("POB_NUM_PROCESSES", "8")
    monkeypatch.setenv("POB_PROCESS_ID", "5")
    mesh_mod.init_multihost()
    assert calls[-1] == {
        "coordinator_address": "host9:999", "num_processes": 8, "process_id": 5,
    }
