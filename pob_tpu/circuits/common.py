"""Protocol-specific building blocks shared by ProofOfBurn and Spend:
burn-address derivation, PoW check, public commitment
(reference circuits/utils/{burn_address,proof_of_work,public_commitment}.circom)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FR
from ..field.ref import FR_MOD
from ..hash import keccak as kdev
from ..hash.poseidon import poseidon_limbs
from ..hash.poseidon_params import (
    POSEIDON_BURN_ADDRESS_PREFIX,
    POSEIDON_COIN_PREFIX,
    POSEIDON_NULLIFIER_PREFIX,
)
from ..gadgets.bytesops import I32, bytes_to_nibbles, filter_mask

_R = (1 << 256) % FR_MOD


def const_limbs(v: int, batch_shape=()):
    """Embed a python-int Fr constant, broadcast over batch axes."""
    arr = jnp.asarray(limb.int_to_limbs(v % FR_MOD))
    return jnp.broadcast_to(arr, batch_shape + (limb.L,))


def poseidon_fixed(values):
    """Poseidon over a list of (..., 16) canonical limb scalars."""
    stacked = jnp.stack(jnp.broadcast_arrays(*values), axis=-2)
    return poseidon_limbs(stacked)


def public_commitment(values_be32):
    """PublicCommitment(N) (public_commitment.circom:18-42):
    keccak(concat of N 32-byte values) >> 8, as an Fr limb scalar.

    values_be32: (..., N, 32) int32 bytes. Returns (commitment_limbs, ok)."""
    n = values_be32.shape[-2]
    flat = values_be32.reshape(values_be32.shape[:-2] + (n * 32,))
    ok = jnp.all((flat >= 0) & (flat < 256), axis=-1)
    digest = kdev.keccak_fixed(flat)  # (..., 32)
    reduced = digest[..., :31]  # drop the least-significant byte
    padded = jnp.zeros(digest.shape[:-1] + (32,), I32).at[..., 1:].set(reduced)
    return limb.be_bytes_to_limbs(padded), ok


def burn_address_hash(burn_key, reveal_amount, burn_extra):
    """BurnAddressHash (burn_address.circom:67-83): keccak(first 20 BE bytes of
    Poseidon4(prefix, burnKey, revealAmount, burnExtraCommitment)) as 64
    nibbles. Inputs are canonical limb scalars."""
    batch = burn_key.shape[:-1]
    h = poseidon_fixed(
        [const_limbs(POSEIDON_BURN_ADDRESS_PREFIX, batch), burn_key, reveal_amount, burn_extra]
    )
    addr = limb.limbs_to_be_bytes(h)[..., :20]  # (..., 20)
    block = jnp.zeros(batch + (136,), I32).at[..., :20].set(addr)
    digest = kdev.keccak_bytes(block, jnp.full(batch, 20, I32), 1)
    return bytes_to_nibbles(digest)  # (..., 64)


def pow_check(burn_key, reveal_amount, burn_extra, min_zero_bytes):
    """ProofOfWorkChecker (proof_of_work.circom:54-81): the first
    min_zero_bytes bytes of keccak(BE32(burnKey)||BE32(reveal)||BE32(extra)||
    'EIP-7503') must be zero. Returns a bool flag."""
    batch = burn_key.shape[:-1]
    msg = jnp.concatenate(
        [
            limb.limbs_to_be_bytes(burn_key).astype(I32),
            limb.limbs_to_be_bytes(reveal_amount).astype(I32),
            limb.limbs_to_be_bytes(burn_extra).astype(I32),
            jnp.broadcast_to(
                jnp.asarray(np.frombuffer(b"EIP-7503", np.uint8).astype(np.int32)),
                batch + (8,),
            ),
        ],
        axis=-1,
    )  # (..., 104)
    block = jnp.zeros(batch + (136,), I32).at[..., :104].set(msg)
    digest = kdev.keccak_bytes(block, jnp.full(batch, 104, I32), 1)
    should_zero = filter_mask(min_zero_bytes, 32)
    return jnp.all(digest * should_zero == 0, axis=-1)


__all__ = [
    "const_limbs",
    "poseidon_fixed",
    "public_commitment",
    "burn_address_hash",
    "pow_check",
    "POSEIDON_BURN_ADDRESS_PREFIX",
    "POSEIDON_COIN_PREFIX",
    "POSEIDON_NULLIFIER_PREFIX",
]
