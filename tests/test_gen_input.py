"""Offline end-to-end test of the live input-generation path (the role of the
reference's tests/main.py against a Ganache devnet, README.md:60-66): a mocked
JSON-RPC node synthesizes a consistent single-leaf state trie for whatever
burn address the grinder derives, and the generated circuit input must pass
the full ProofOfBurn forward validity check with the expected commitment.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
from pob_tpu.harness import rlp_host as rlp
from pob_tpu.harness.generate import Eth, build_spend_input, generate_live
from pob_tpu.harness.inputs import batch_stack, load_pob_input, pob_expected_commitment
from pob_tpu.hash.keccak_ref import keccak256

EMPTY_STORAGE = bytes.fromhex(
    "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"
)
EMPTY_CODE = bytes.fromhex(
    "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
)

BALANCE = 999  # wei; <= TEST_CONFIG.max_intended_balance


def make_leaf(address: bytes, balance: int) -> bytes:
    """Account leaf of a single-node trie: all 64 address-hash nibbles live in
    the leaf key (HP even prefix 0x20, merkle_patricia_trie_leaf.circom:17-45)."""
    key = b"\x20" + keccak256(address)
    account = rlp.encode([0, balance, EMPTY_STORAGE, EMPTY_CODE])
    return rlp.encode([key, account])


class MockEth(Eth):
    """Responds like a one-account devnet whose whole state trie is the
    burn-address leaf (stateRoot = keccak(leaf))."""

    def __init__(self):
        self.leaf = None

    def call(self, method, params):
        if method == "eth_blockNumber":
            return "0x1"
        if method == "eth_getProof":
            addr = bytes.fromhex(params[0][2:])
            self.leaf = make_leaf(addr, BALANCE)
            return {
                "accountProof": ["0x" + self.leaf.hex()],
                "balance": hex(BALANCE),
            }
        if method == "eth_getBlockByNumber":
            state_root = keccak256(self.leaf)
            block = {
                "parentHash": "0x" + "11" * 32,
                "sha3Uncles": "0x" + "22" * 32,
                "miner": "0x" + "33" * 20,
                "stateRoot": "0x" + state_root.hex(),
                "transactionsRoot": "0x" + "44" * 32,
                "receiptsRoot": "0x" + "55" * 32,
                "logsBloom": "0x" + "00" * 256,
                "difficulty": "0x0",
                "number": "0x1",
                "gasLimit": "0x1c9c380",
                "gasUsed": "0x5208",
                "timestamp": "0x68a5e000",
                "extraData": "0x",
                "mixHash": "0x" + "66" * 32,
                "nonce": "0x0000000000000000",
                "baseFeePerGas": "0x7",
            }
            from pob_tpu.harness.generate import assemble_header

            block["hash"] = "0x" + keccak256(assemble_header(block)).hex()
            return block
        raise AssertionError(f"unexpected RPC {method}")


def test_generate_live_against_mock_node():
    inp = generate_live(TEST_CONFIG, MockEth(), reveal=234, burn_extra=43287974328)
    assert inp["numLayers"] == 1
    assert inp["numLeafAddressNibbles"] == "64"

    from pob_tpu.circuits.proof_of_burn import pob_forward

    loaded = load_pob_input(inp, TEST_CONFIG)
    kw = {k: jnp.asarray(v) for k, v in batch_stack([loaded]).items()}
    out = pob_forward(TEST_CONFIG, **kw)
    assert bool(np.asarray(out["valid"]).all()), "generated input must validate"
    import pob_tpu.field.limb as limb

    got = limb.limbs_to_int(np.asarray(out["commitment"])[0])
    assert got == pob_expected_commitment(inp, TEST_CONFIG)


def test_gen_input_cli_writes_files(tmp_path, monkeypatch):
    """The gen-input CLI path (cli.py) end-to-end against the mocked node."""
    from pob_tpu import cli
    from pob_tpu.harness import generate

    monkeypatch.setattr(generate, "Eth", lambda url: MockEth())
    out = tmp_path / "pob.json"
    spend_out = tmp_path / "spend.json"
    rc = cli.main(
        [
            "gen-input", "--rpc", "http://mock", "--config", "test",
            "--out", str(out), "--spend-out", str(spend_out),
        ]
    )
    assert rc == 0
    pob_inp = json.load(open(out))
    assert int(pob_inp["blockHeaderLen"]) > 500
    spend_inp = json.load(open(spend_out))
    assert int(spend_inp["balance"]) == int(pob_inp["intendedBalance"]) - int(
        pob_inp["revealAmount"]
    )
