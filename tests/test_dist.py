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
