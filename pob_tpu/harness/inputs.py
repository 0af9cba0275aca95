"""Input shaping and golden expectations.

Loads the reference-format circuit input JSON (shape documented at
tests/main.py:160-192 of the reference) into batched device arrays, and
computes expected commitments host-side from the independent golden models
(the role of tests/testcases/public_commitment.py expected_commitment)."""

from __future__ import annotations

import json

import numpy as np

from ..field import limb
from ..field.ref import FR_MOD
from ..hash.keccak_ref import keccak256
from ..hash.poseidon_ref import (
    POSEIDON_COIN_PREFIX,
    POSEIDON_NULLIFIER_PREFIX,
    poseidon2,
    poseidon3,
)


def expected_commitment(values) -> int:
    """keccak(concat of 32-byte BE values) with the last byte dropped, as an
    Fr int (reference public_commitment.circom:18-42)."""
    msg = b"".join(int(v).to_bytes(32, "big") for v in values)
    return int.from_bytes(keccak256(msg)[:31], "big")


def _as_int(v) -> int:
    return int(v)


def load_spend_input(path_or_dict):
    d = path_or_dict if isinstance(path_or_dict, dict) else json.load(open(path_or_dict))
    return {
        "burn_key": _as_int(d["burnKey"]),
        "balance": _as_int(d["balance"]),
        "withdrawn": _as_int(d["withdrawnBalance"]),
        "extra_commitment": _as_int(d["extraCommitment"]),
    }


def spend_expected_commitment(inp: dict) -> int:
    coin = poseidon3(POSEIDON_COIN_PREFIX, inp["burn_key"], inp["balance"])
    remaining = poseidon3(
        POSEIDON_COIN_PREFIX, inp["burn_key"],
        (inp["balance"] - inp["withdrawn"]) % FR_MOD,
    )
    return expected_commitment(
        [coin, inp["withdrawn"], remaining, inp["extra_commitment"]]
    )


def load_pob_input(path_or_dict, cfg):
    """Reference-format ProofOfBurn input dict -> kwargs for pob_forward
    (single instance; stack along a new leading axis to batch)."""
    d = path_or_dict if isinstance(path_or_dict, dict) else json.load(open(path_or_dict))
    layers = np.asarray(d["layers"], np.int64)
    assert layers.shape == (cfg.max_num_layers, cfg.max_node_bytes), layers.shape
    header = np.asarray(d["blockHeader"], np.int64)
    assert header.shape == (cfg.max_header_bytes,), header.shape

    def scalar(key):
        return limb.int_to_limbs(_as_int(d[key]) % FR_MOD)

    return {
        "burn_key": scalar("burnKey"),
        "actual_balance": scalar("actualBalance"),
        "intended_balance": scalar("intendedBalance"),
        "reveal_amount": scalar("revealAmount"),
        "burn_extra_commitment": scalar("burnExtraCommitment"),
        "num_leaf_address_nibbles": np.int32(_as_int(d["numLeafAddressNibbles"])),
        "layers": layers.astype(np.int32),
        "layer_lens": np.asarray(d["layerLens"], np.int32),
        "num_layers": np.int32(_as_int(d["numLayers"])),
        "block_header": header.astype(np.int32),
        "block_header_len": np.int32(_as_int(d["blockHeaderLen"])),
        "byte_security_relax": np.int32(_as_int(d.get("byteSecurityRelax", 0))),
        "proof_extra_commitment": scalar("_proofExtraCommitment")
        if "_proofExtraCommitment" in d
        else limb.int_to_limbs(0),
    }


def pob_expected_commitment(path_or_dict, cfg) -> int:
    """Golden commitment recomputed host-side (mirrors
    tests/testcases/proof_of_burn.py:18-37 but derives the block root from the
    supplied header instead of hardcoding it)."""
    d = path_or_dict if isinstance(path_or_dict, dict) else json.load(open(path_or_dict))
    header = bytes(int(b) for b in d["blockHeader"][: _as_int(d["blockHeaderLen"])])
    block_root = int.from_bytes(keccak256(header), "big")
    burn_key = _as_int(d["burnKey"])
    nullifier = poseidon2(POSEIDON_NULLIFIER_PREFIX, burn_key)
    remaining = poseidon3(
        POSEIDON_COIN_PREFIX,
        burn_key,
        (_as_int(d["intendedBalance"]) - _as_int(d["revealAmount"])) % FR_MOD,
    )
    return expected_commitment(
        [
            block_root,
            nullifier,
            remaining,
            _as_int(d["revealAmount"]),
            _as_int(d["burnExtraCommitment"]),
            _as_int(d.get("_proofExtraCommitment", 0)),
        ]
    )


def widen_pob_input(d: dict, cfg) -> dict:
    """Widen a recorded input to a larger circuit config: pad unused MPT layer
    slots (dummy layerLens=256, mirroring the reference generator,
    tests/main.py:148-150) and zero-extend node/header buffers."""
    out = dict(d)
    layers = [list(l) for l in d["layers"]]
    lens = list(d["layerLens"])
    node_bytes = cfg.max_node_bytes
    layers = [l + [0] * (node_bytes - len(l)) for l in layers]
    while len(layers) < cfg.max_num_layers:
        layers.append([0] * node_bytes)
        lens.append(256)
    out["layers"] = layers[: cfg.max_num_layers]
    out["layerLens"] = lens[: cfg.max_num_layers]
    header = list(d["blockHeader"])
    out["blockHeader"] = header + [0] * (cfg.max_header_bytes - len(header))
    return out


def batch_stack(instances):
    """Stack per-instance kwargs dicts into a batched kwargs dict."""
    keys = instances[0].keys()
    return {k: np.stack([np.asarray(inst[k]) for inst in instances]) for k in keys}
