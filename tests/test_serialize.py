"""Toolchain-format serialization (SURVEY.md §2.8, §7.3.5): .wtns and .r1cs
binary roundtrips, and device-vs-host cross-checks of the Groth16 setup
ingredients (Lagrange evaluations, QAP poly evals)."""

import jax.numpy as jnp
import numpy as np

from pob_tpu.field import limb
from pob_tpu.field.limb import FR as FRS
from pob_tpu.field.ref import FR_MOD
from pob_tpu.prover import groth16, serialize
from pob_tpu.r1cs.builder import ConstraintSystem


def _toy_cs():
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (2,))
    cs.mark_public(2)
    priv = cs.alloc_block("priv", (2,))
    x, y = priv
    z1, z2 = pub
    cs.add([(x, 1)], [(y, 1)], [(z1, 1)])
    cs.add([(x, 1), (y, 2)], [(x, 5)], [(z2, 1), (x, FR_MOD - 3)])
    cs.add([(x, 7)], [(y, 1)], [])
    return cs


def test_wtns_roundtrip(tmp_path):
    vals = [1, 12345, FR_MOD - 1, 0, 98765432123456789]
    p = str(tmp_path / "w.wtns")
    serialize.write_wtns(p, vals)
    prime, out = serialize.read_wtns(p)
    assert prime == FR_MOD
    assert out == [v % FR_MOD for v in vals]


def test_r1cs_roundtrip(tmp_path):
    cs = _toy_cs()
    p = str(tmp_path / "c.r1cs")
    serialize.write_r1cs(p, cs)
    back = serialize.read_r1cs(p)
    assert back["prime"] == FR_MOD
    assert back["num_wires"] == cs.num_wires
    assert back["num_public_out"] == cs.num_public
    assert back["num_constraints"] == cs.num_constraints
    # rebuild expected per-constraint dicts from the COO matrices
    expected = [({}, {}, {}) for _ in range(cs.num_constraints)]
    for m, coo in enumerate(cs.matrices()):
        rows, cols, coeffs = coo
        for r, c, v in zip(rows, cols, coeffs):
            expected[int(r)][m][int(c)] = v % FR_MOD
    assert back["constraints"] == [tuple(e) for e in expected]


def test_lagrange_dev_matches_host():
    tau = 0x1234567890ABCDEF1234567890ABCDEF % FR_MOD
    k = 4
    host = groth16._lagrange_at_tau(k, tau)
    dev = limb.from_mont(FRS, groth16._lagrange_at_tau_mont_dev(k, tau))
    assert [limb.limbs_to_int(row) for row in np.asarray(dev)] == host


def test_poly_evals_dev_matches_host():
    tau = 987654321987654321 % FR_MOD
    k = 3
    lag = groth16._lagrange_at_tau(k, tau)
    rows = np.array([0, 0, 1, 5, 7, 7, 7], np.int64)
    cols = np.array([0, 3, 1, 2, 0, 3, 2], np.int64)
    coeffs = [1, 2, FR_MOD - 1, 17, 5, 6, FR_MOD - 12345]
    nw = 4
    host = groth16._poly_evals_at_tau((rows, cols, coeffs), lag, nw)
    lag_m = groth16._lagrange_at_tau_mont_dev(k, tau)
    dev = groth16._poly_evals_dev(
        (rows, cols, np.arange(len(coeffs), dtype=np.int32), coeffs), lag_m, nw
    )
    assert [limb.limbs_to_int(row) for row in np.asarray(dev)] == host


def test_batch_inv_mont_scan():
    vals = [1, 2, 3, 0, 12345678901234567890 % FR_MOD, FR_MOD - 1]
    a = limb.to_mont(FRS, jnp.asarray(limb.ints_to_limbs(vals)))
    inv = limb.from_mont(FRS, limb.batch_inv_mont_scan(FRS, a))
    got = [limb.limbs_to_int(r) for r in np.asarray(inv)]
    exp = [pow(v, FR_MOD - 2, FR_MOD) if v else 0 for v in vals]
    assert got == exp


def test_mont_powers():
    base = 31337
    n = 11
    pw = limb.from_mont(FRS, limb.mont_powers(FRS, base, n))
    got = [limb.limbs_to_int(r) for r in np.asarray(pw)]
    assert got == [pow(base, j, FR_MOD) for j in range(n)]
