"""R1CS soundness (negative) corpus: the constraint system must REJECT
tampered witnesses — the CS-layer port of the reference's `expected=None`
convention, where witness generation must fail on invalid inputs
(tests/test.py:65-68).

Covers: the Num2Bits_strict x+p alias attack (with a fully adversarial
witness whose keccak trace is recomputed for the aliased message), plus one
tampered wire per gadget class: keccak bit, poseidon s-box, boolean bit,
one-hot selector, inverse hint, range bits, public output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pob_tpu.field import limb
from pob_tpu.field.ref import FR_MOD
from pob_tpu.hash.poseidon_params import POSEIDON_COIN_PREFIX
from pob_tpu.hash.poseidon_ref import poseidon3
from pob_tpu.r1cs import witness as wit
from pob_tpu.r1cs.builder import ConstraintSystem
from pob_tpu.r1cs.gadgets_cs import (
    is_zero_cs,
    one_hot_cs,
    strict_decomposition,
)
from pob_tpu.r1cs.lc import lc_wire
from pob_tpu.r1cs.spend_circuit import (
    assemble_witness,
    build_spend_cs,
    spend_witness,
)

ALIAS_BOUND = (1 << 254) - FR_MOD  # coin values with a valid x + p encoding


def _find_aliasable_input():
    """A spend input whose coin hash admits the x+p alias (prob ~1/3 per try)."""
    balance, withdrawn, extra = 10**18, 12345, 777
    for bk in range(1, 200):
        coin = poseidon3(POSEIDON_COIN_PREFIX, bk, balance)
        if coin < ALIAS_BOUND:
            return dict(burn_key=bk, balance=balance, withdrawn=withdrawn,
                        extra_commitment=extra), coin
    raise AssertionError("no aliasable burn key found in range")


@pytest.fixture(scope="module")
def spend_setup():
    cs = build_spend_cs()
    inp, coin = _find_aliasable_input()
    args = [
        jnp.asarray(limb.ints_to_limbs([inp[k] % FR_MOD]))
        for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
    ]
    blocks = jax.jit(spend_witness)(*args)
    buf = np.asarray(assemble_witness(cs, blocks))[0]
    w = limb.limb_rows_to_ints(buf)
    assert cs.check_witness(w), "canonical witness must pass"
    return cs, inp, coin, blocks, w


def _block(cs, name):
    for blk in cs.blocks:
        if blk.name == name:
            return blk
    raise KeyError(name)


def _wire(cs, name, flat_index=0):
    return _block(cs, name).start + flat_index


def test_alias_attack_rejected_by_strict_check(spend_setup):
    """THE Num2Bits_strict attack (convert.circom:46-56): encode coin as
    coin + p in coin_bits, recompute the whole keccak trace for the aliased
    message, and put the forged commitment on the public wire. Every
    constraint except the strict alias check is satisfied — the strict check
    alone must reject the witness."""
    cs, inp, coin, blocks, _w = spend_setup
    aliased = coin + FR_MOD
    assert aliased < (1 << 254)

    b = {k: np.asarray(v) for k, v in blocks.items()}
    alias_bits = jnp.asarray(
        [[(aliased >> i) & 1 for i in range(254)]], jnp.int32
    )
    b["coin_bits"] = np.asarray(alias_bits)
    st = wit.strict_bits_trace(alias_bits)
    b["coin_bits_eq"] = np.asarray(st["eq"])
    b["coin_bits_gt"] = np.asarray(st["gt"])
    # the adversarial keccak: message bytes with the aliased coin encoding
    withdrawn, extra = inp["withdrawn"], inp["extra_commitment"]
    remaining = poseidon3(POSEIDON_COIN_PREFIX, inp["burn_key"],
                          inp["balance"] - withdrawn)
    msg = np.zeros((1, 136), np.int32)
    for vi, val in enumerate((aliased, withdrawn, remaining, extra)):
        msg[0, vi * 32 : (vi + 1) * 32] = list(val.to_bytes(32, "big"))
    msg[0, 128] = 0x01
    msg[0, 135] = 0x80
    from pob_tpu.hash import keccak as kdev

    blk_lo, blk_hi = kdev.bytes_to_blocks(jnp.asarray(msg), 1)
    lo = jnp.zeros((1, 25), jnp.uint32).at[..., :17].set(blk_lo[..., 0, :])
    hi = jnp.zeros((1, 25), jnp.uint32).at[..., :17].set(blk_hi[..., 0, :])
    kb, (flo, fhi) = wit.keccak_f_trace(lo, hi)
    for k, v in kb.items():
        b[f"k_{k}"] = np.asarray(v)
    digest = np.asarray(kdev.state_to_digest(flo, fhi))
    forged = int.from_bytes(bytes(digest[0, :31].tolist()), "big")
    b["pub"] = np.asarray(
        limb.be_bytes_to_limbs(
            jnp.asarray([[0] + digest[0, :31].tolist()], jnp.int32)
        )
    )[:, None, :]

    buf = np.asarray(assemble_witness(cs, {k: jnp.asarray(v) for k, v in b.items()}))[0]
    w = limb.limb_rows_to_ints(buf)
    assert not cs.check_witness(w), "alias attack must be rejected"
    # ... and rejected ONLY by the strict gadget: everything else is satisfied
    bad = cs.failing_constraints(w, limit=10)
    assert 1 <= len(bad) <= 2, f"only the strict check should fail, got {bad}"


def _tampered(w, idx, value):
    w2 = list(w)
    w2[idx] = value % FR_MOD
    return w2


def test_tamper_keccak_bit(spend_setup):
    cs, _inp, _coin, _blocks, w = spend_setup
    i = _wire(cs, "k_co", 12345)
    assert not cs.check_witness(_tampered(w, i, 1 - int(w[i])))


def test_tamper_poseidon_sbox(spend_setup):
    cs, _inp, _coin, _blocks, w = spend_setup
    i = _wire(cs, "pc_x5", 3)
    assert not cs.check_witness(_tampered(w, i, int(w[i]) + 1))


def test_tamper_boolean_bit_nonboolean(spend_setup):
    cs, _inp, _coin, _blocks, w = spend_setup
    i = _wire(cs, "balance_bits", 0)
    # value 2 with a compensating flip elsewhere would break booleanity
    assert not cs.check_witness(_tampered(w, i, 2))


def test_tamper_range_bits(spend_setup):
    cs, _inp, _coin, _blocks, w = spend_setup
    i = _wire(cs, "diff_bits", 247)
    assert not cs.check_witness(_tampered(w, i, 1 - int(w[i])))


def test_tamper_public_output(spend_setup):
    cs, _inp, _coin, _blocks, w = spend_setup
    assert not cs.check_witness(_tampered(w, 1, int(w[1]) + 1))


def test_tamper_one_hot_two_ones():
    """One-hot selector with two active positions must be rejected
    (Selector's sum === 1, selector.circom:43)."""
    cs = ConstraintSystem()
    idx = cs.alloc_block("idx", (1,))
    oh = one_hot_cs(cs, "oh", 8, lc_wire(int(idx[0])))
    good = [1, 3] + [0] * 8
    good[2 + 3] = 1  # oh[3]
    assert cs.check_witness(good)
    bad = [1, 4] + [0] * 8
    bad[2 + 1] = 1
    bad[2 + 3] = 1  # two ones summing index 1+3=4: sum oh = 2 violates
    assert not cs.check_witness(bad)
    outside = [1, 9] + [0] * 8  # index 9 outside [0,8): unsatisfiable
    assert not cs.check_witness(outside)


def test_tamper_inverse_hint():
    """IsZero's inverse hint cannot fake out=1 on a nonzero value or out=0 on
    zero (the x*out = 0 and out = 1 - x*inv pair)."""
    cs = ConstraintSystem()
    x = cs.alloc_block("x", (1,))
    is_zero_cs(cs, "iz", [lc_wire(int(x[0]))])
    # layout: [1, x, inv, out]
    assert cs.check_witness([1, 5, pow(5, FR_MOD - 2, FR_MOD), 0])
    assert cs.check_witness([1, 0, 0, 1])
    assert not cs.check_witness([1, 5, 0, 1])  # claim zero on nonzero
    assert not cs.check_witness([1, 0, 0, 0])  # claim nonzero on zero
    assert not cs.check_witness([1, 5, 123, 1])


def test_strict_gadget_standalone():
    """strict_decomposition rejects exactly the x+p encodings."""
    cs = ConstraintSystem()
    v = cs.alloc_block("v", (1,))
    bits = cs.alloc_block("bits", (254,))
    strict_decomposition(cs, "bits", lc_wire(int(v[0])), bits)

    def witness(x_enc):
        bvals = [(x_enc >> i) & 1 for i in range(254)]
        t = [bvals[i] if (FR_MOD - 1) >> i & 1 else 1 - bvals[i] for i in range(254)]
        eq = [0] * 254
        acc = 1
        for i in range(253, -1, -1):
            acc *= t[i]
            eq[i] = acc
        zp = [i for i in range(254) if not ((FR_MOD - 1) >> i & 1)]
        gt = [(eq[i + 1] if i + 1 < 254 else 1) * bvals[i] for i in zp]
        return [1, x_enc % FR_MOD] + bvals + eq + gt

    x = ALIAS_BOUND - 1  # aliasable value
    assert cs.check_witness(witness(x)), "canonical encoding passes"
    assert not cs.check_witness(witness(x + FR_MOD)), "alias encoding rejected"
    assert cs.check_witness(witness(FR_MOD - 1)), "p-1 itself is canonical"
