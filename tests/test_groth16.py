"""End-to-end Groth16 on a toy circuit: prove knowledge of x, y with
x*y = z1, (x+y)*x = z2, publics [z1, z2]. Exercises setup, the device
matvec/NTT/MSM pipeline, and host pairing verification."""

import numpy as np
import jax.numpy as jnp

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.r1cs.builder import ConstraintSystem
from pob_tpu.prover import groth16


def toy_cs():
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (2,))  # z1, z2
    cs.mark_public(2)
    priv = cs.alloc_block("priv", (2,))  # x, y
    x, y = priv
    z1, z2 = pub
    cs.add([(x, 1)], [(y, 1)], [(z1, 1)])  # x * y = z1
    cs.add([(x, 1), (y, 1)], [(x, 1)], [(z2, 1)])  # (x + y) * x = z2
    return cs


def toy_witness(x, y):
    z1 = x * y % FR_MOD
    z2 = (x + y) * x % FR_MOD
    return [1, z1, z2, x, y], [z1, z2]


def test_groth16_toy_roundtrip():
    cs = toy_cs()
    w, pub = toy_witness(345, 678)
    assert cs.check_witness(w)

    pk, vk = groth16.setup(cs)
    witness = limb.ints_to_limbs(w)
    proof = groth16.prove(pk, witness, r=12345, s=67890)
    assert groth16.verify(vk, proof, pub), "valid proof must verify"
    assert not groth16.verify(vk, proof, [pub[0], (pub[1] + 1) % FR_MOD]), (
        "wrong public input must fail"
    )
    # corrupt proof
    bad = (proof[0], proof[1], (proof[2][0], (proof[2][1] + 1) % FR_MOD))
    assert not groth16.verify(vk, bad, pub)


def test_groth16_toy_different_witness_same_statement():
    cs = toy_cs()
    pk, vk = groth16.setup(cs)
    w, pub = toy_witness(999999, 123456789)
    assert cs.check_witness(w)
    proof = groth16.prove(pk, limb.ints_to_limbs(w))
    assert groth16.verify(vk, proof, pub)


def test_groth16_prove_batch():
    """Batched prover: one compiled program emits B proofs; every proof must
    verify against its own publics and fail against its neighbor's."""
    cs = toy_cs()
    pk, vk = groth16.setup(cs)
    cases = [toy_witness(100 + i, 7000 + 13 * i) for i in range(4)]
    W = jnp.asarray(np.stack([limb.ints_to_limbs(w) for w, _ in cases]))
    proofs = groth16.prove_batch(pk, W, rs=[(i + 1, i + 2) for i in range(4)])
    assert len(proofs) == 4
    for i, (proof, (_, pub)) in enumerate(zip(proofs, cases)):
        assert groth16.verify(vk, proof, pub), f"batched proof {i} must verify"
    other = cases[0][1]
    assert not groth16.verify(vk, proofs[1], other)


def bit_cs():
    """Circuit with a bit-decomposition: x private, publics [x], constraint
    x = sum 2^i b_i with b_i boolean — exercises the width-classified MSM
    plan (bit wires through the conditional-add sweep)."""
    cs = ConstraintSystem()
    pub = cs.alloc_block("pub", (1,))
    cs.mark_public(1)
    x = cs.alloc_block("x", (1,))
    bits = cs.alloc_block("bits", (16,))
    for b in bits:
        cs.add([(int(b), 1)], [(int(b), 1)], [(int(b), 1)])  # b*b = b
    recomp = [(int(bits[i]), 1 << i) for i in range(16)]
    cs.add(recomp + [(int(x[0]), FR_MOD - 1)], [(0, 1)], [])
    cs.add([(int(x[0]), 1)], [(0, 1)], [(int(pub[0]), 1)])
    return cs


def test_classified_msm_plan_matches_plain():
    """classify_bit_wires must find exactly the booleanity-constrained wires,
    and the planned (classified/compacted) prover must produce bit-identical
    proofs to the plain full-width path."""
    cs = bit_cs()
    x = 0xBEEF
    w = [1, x, x] + [(x >> i) & 1 for i in range(16)]
    assert cs.check_witness(w)

    bit = groth16.classify_bit_wires(cs)
    assert not bit[0] and not bit[1] and not bit[2]
    assert bit[3:19].all(), "all 16 decomposition bits must classify as bits"

    pk, vk = groth16.setup(cs)
    assert pk.plan is not None
    witness = limb.ints_to_limbs(w)
    planned = groth16.prove(pk, witness, r=99, s=77)
    plan, pk.plan = pk.plan, None
    plain = groth16.prove(pk, witness, r=99, s=77)
    pk.plan = plan
    assert planned == plain, "classified plan must not change the proof"
    assert groth16.verify(vk, planned, [x])


def test_groth16_zkey_roundtrip(tmp_path):
    """setup -> write_zkey -> load_zkey -> prove with the loaded key ->
    verify with the loaded vk (and cross-verify against the original vk)."""
    from pob_tpu.prover import serialize

    cs = toy_cs()
    pk, vk = groth16.setup(cs)
    path = str(tmp_path / "toy.zkey")
    serialize.write_zkey(path, pk, vk, cs)

    pk2, vk2 = groth16.load_zkey(path)
    assert pk2.k == pk.k and pk2.num_public == cs.num_public
    w, pub = toy_witness(31337, 271828)
    proof = groth16.prove(pk2, limb.ints_to_limbs(w), r=7, s=11)
    assert groth16.verify(vk2, proof, pub), "proof from loaded zkey must verify"
    assert groth16.verify(vk, proof, pub), "original vk must accept it too"
    assert not groth16.verify(vk2, proof, [pub[0], (pub[1] + 3) % FR_MOD])
