"""Command-line entry point — the framework's equivalent of the reference's
`make` pipeline (Makefile:1-6: compile circuits, generate inputs, run the C++
witness generator) plus the downstream snarkjs stages the reference delegates
(circuitscan.yml:27-39):

    python -m pob_tpu witness --circuit spend --input in.json --wtns out.wtns
    python -m pob_tpu setup   --circuit spend --zkey spend.zkey --r1cs spend.r1cs
    python -m pob_tpu prove   --circuit spend --input in.json --zkey spend.zkey
    python -m pob_tpu verify  --vk vk.json --proof proof.json --public public.json
    python -m pob_tpu grind   --reveal 234 --extra 43287974328 --zero-bytes 2
    python -m pob_tpu gen-input --rpc http://127.0.0.1:8545 --out input.json

Heavy work (witness generation, setup, proving) runs on the JAX default
backend (TPU when present)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _pob_config(name: str):
    from .circuits.proof_of_burn import PROD_CONFIG, TEST_CONFIG

    return {"test": TEST_CONFIG, "prod": PROD_CONFIG}[name]


def _build_cs(circuit: str, config: str):
    if circuit == "spend":
        from .r1cs.spend_circuit import build_spend_cs

        return build_spend_cs()
    from .r1cs.pob_circuit import build_pob_cs

    return build_pob_cs(_pob_config(config))


def _witness_limbs(circuit: str, config: str, input_path: str, cs):
    """Device witness for one instance -> (nw, 16) numpy canonical limbs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .field import limb

    if circuit == "spend":
        from .harness.inputs import load_spend_input
        from .r1cs.spend_circuit import spend_full_witness

        inp = load_spend_input(input_path)
        args = [
            jnp.asarray(limb.ints_to_limbs([inp[k]]))
            for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
        ]
        return np.asarray(jax.jit(spend_full_witness)(*args))[0]

    from .harness.inputs import batch_stack, load_pob_input
    from .r1cs.pob_circuit import pob_r1cs_witness
    from .r1cs.spend_circuit import assemble_witness

    cfg = _pob_config(config)
    inp = load_pob_input(input_path, cfg)
    kw = {k: jnp.asarray(v) for k, v in batch_stack([inp]).items()}
    # NOT whole-trace jitted: that produces a ~17MB module that is punishing
    # to compile (and can OOM the TPU AOT compile helper). pob_r1cs_witness
    # jits per-gadget instead (one program per gadget/shape, shared across
    # the L+1 keccaks etc. — see pob_circuit.py), so this call compiles a
    # handful of small programs and dispatches them compiled.
    blocks = pob_r1cs_witness(cfg, **kw)
    return np.asarray(assemble_witness(cs, blocks))[0]


def cmd_witness(args):
    from .field import limb
    from .prover import serialize

    t0 = time.time()
    cs = _build_cs(args.circuit, args.config)
    w = _witness_limbs(args.circuit, args.config, args.input, cs)
    ints = limb.limb_rows_to_ints(w)
    assert ints[0] == 1
    if not cs.check_witness(ints):
        print("witness does NOT satisfy the constraint system", file=sys.stderr)
        return 1
    serialize.write_wtns(args.wtns, ints)
    print(f"wrote {args.wtns}: {cs.num_wires} wires, "
          f"{cs.num_constraints} constraints ({time.time()-t0:.1f}s)")
    return 0


def cmd_setup(args):
    from .prover import groth16, serialize

    t0 = time.time()
    cs = _build_cs(args.circuit, args.config)
    pk, vk = groth16.setup(cs)
    serialize.write_zkey(args.zkey, pk, vk, cs)
    if args.r1cs:
        serialize.write_r1cs(args.r1cs, cs)
    if args.vk:
        with open(args.vk, "w") as f:
            json.dump(serialize.vk_to_snarkjs(vk), f, indent=1)
    print(f"setup done: domain 2^{pk.k}, {cs.num_wires} wires "
          f"-> {args.zkey} ({time.time()-t0:.1f}s)")
    return 0


def cmd_prove(args):
    from .field import limb
    from .prover import groth16, serialize

    t0 = time.time()
    cs = _build_cs(args.circuit, args.config)
    if args.zkey and os.path.exists(args.zkey):
        pk, vk = groth16.load_zkey(args.zkey)
    else:
        pk, vk = groth16.setup(cs)
        if args.zkey:
            serialize.write_zkey(args.zkey, pk, vk, cs)
    w = _witness_limbs(args.circuit, args.config, args.input, cs)
    proof = groth16.prove(pk, w)
    publics = [limb.limbs_to_int(w[j]) for j in range(1, cs.num_public + 1)]
    if not groth16.verify(vk, proof, publics):
        print("self-verification FAILED", file=sys.stderr)
        return 1
    serialize.write_proof(args.proof, proof, publics)
    if args.vk:
        with open(args.vk, "w") as f:
            json.dump(serialize.vk_to_snarkjs(vk), f, indent=1)
    print(f"proof verified; wrote {args.proof} ({time.time()-t0:.1f}s)")
    return 0


def cmd_verify(args):
    from .prover import groth16, serialize

    vk = serialize.snarkjs_to_vk(json.load(open(args.vk)))
    proof = serialize.snarkjs_to_proof(json.load(open(args.proof)))
    publics = [int(x) for x in json.load(open(args.public))]
    ok = groth16.verify(vk, proof, publics)
    print("OK" if ok else "INVALID")
    return 0 if ok else 1


def cmd_export_verifier(args):
    """Solidity verifier + calldata export — the on-chain deployment stage
    the reference delegates to circuitscan (`snarkjs zkey export
    solidityverifier` semantics, circuitscan.yml:27-39)."""
    from .prover import groth16, serialize
    from .prover.solidity import proof_to_calldata, vk_to_solidity

    if args.zkey:
        _pk, vk = groth16.load_zkey(args.zkey)
    else:
        vk = serialize.snarkjs_to_vk(json.load(open(args.vk)))
    src = vk_to_solidity(vk, args.name)
    with open(args.out, "w") as f:
        f.write(src)
    print(f"wrote {args.out} ({len(vk.ic) - 1} public inputs)")
    if args.proof and args.public:
        proof = serialize.snarkjs_to_proof(json.load(open(args.proof)))
        publics = [int(x) for x in json.load(open(args.public))]
        print(proof_to_calldata(proof, publics))
    return 0


def cmd_grind(args):
    from .harness.pow_grind import find_burn_key, pow_digest

    key = find_burn_key(args.reveal, args.extra, args.zero_bytes,
                        start_key=args.start)
    digest = pow_digest(key, args.reveal, args.extra)
    print(json.dumps({"burnKey": str(key), "powDigest": digest.hex()}))
    return 0


def cmd_gen_input(args):
    from .harness.generate import Eth, build_spend_input, generate_live

    cfg = _pob_config(args.config)
    eth = Eth(args.rpc)
    pob_inp = generate_live(cfg, eth, args.reveal, args.extra, args.zero_bytes)
    with open(args.out, "w") as f:
        json.dump(pob_inp, f)
    if args.spend_out:
        # the spend statement over the coin minted by this burn: withdraw the
        # revealed amount from intendedBalance - revealAmount... the recorded
        # convention (tests/test_spend_input.json) is balance = remaining coin
        # balance, withdrawn chosen by the user; default withdraw-nothing.
        spend_inp = build_spend_input(
            int(pob_inp["burnKey"]),
            int(pob_inp["intendedBalance"]) - int(pob_inp["revealAmount"]),
            0,
            int(pob_inp["burnExtraCommitment"]),
        )
        with open(args.spend_out, "w") as f:
            json.dump(spend_inp, f)
    print(f"wrote {args.out}")
    return 0


def _pin_platform():
    """Honor JAX_PLATFORMS even when a plugin's sitecustomize force-set a
    different default (the axon TPU plugin does); same workaround as
    tests/conftest.py."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def main(argv=None):
    _pin_platform()
    p = argparse.ArgumentParser(prog="pob_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, circuit=True):
        if circuit:
            sp.add_argument("--circuit", choices=["spend", "pob"], required=True)
            sp.add_argument("--config", choices=["test", "prod"], default="test",
                            help="PoB instantiation (main_proof_of_burn.circom:26 "
                                 "prod vs testcases/proof_of_burn.py:54 test)")

    sp = sub.add_parser("witness", help="generate + check a witness, write .wtns")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--wtns", required=True)
    sp.set_defaults(fn=cmd_witness)

    sp = sub.add_parser("setup", help="Groth16 trusted setup, write .zkey")
    common(sp)
    sp.add_argument("--zkey", required=True)
    sp.add_argument("--r1cs")
    sp.add_argument("--vk")
    sp.set_defaults(fn=cmd_setup)

    sp = sub.add_parser("prove", help="witness + Groth16 prove + self-verify")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--zkey", help="load (or create) the proving key here")
    sp.add_argument("--proof", default="proof.json")
    sp.add_argument("--vk")
    sp.set_defaults(fn=cmd_prove)

    sp = sub.add_parser("verify", help="verify a snarkjs proof.json")
    sp.add_argument("--vk", required=True)
    sp.add_argument("--proof", required=True)
    sp.add_argument("--public", required=True)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("export-verifier",
                        help="emit a Solidity on-chain verifier (+ calldata)")
    sp.add_argument("--zkey", help="read the vk from a .zkey")
    sp.add_argument("--vk", help="or from a snarkjs verification_key.json")
    sp.add_argument("--out", default="verifier.sol")
    sp.add_argument("--name", default="Groth16Verifier")
    sp.add_argument("--proof", help="also print calldata for this proof.json")
    sp.add_argument("--public", help="public.json for --proof")
    sp.set_defaults(fn=cmd_export_verifier)

    sp = sub.add_parser("grind", help="grind a PoW-valid burn key (native C++)")
    sp.add_argument("--reveal", type=int, default=0)
    sp.add_argument("--extra", type=int, default=0)
    sp.add_argument("--zero-bytes", type=int, default=2)
    sp.add_argument("--start", type=int, default=1)
    sp.set_defaults(fn=cmd_grind)

    sp = sub.add_parser("gen-input", help="build circuit inputs from a live node")
    sp.add_argument("--rpc", default="http://127.0.0.1:8545")
    sp.add_argument("--config", choices=["test", "prod"], default="test")
    sp.add_argument("--reveal", type=int, default=234)
    sp.add_argument("--extra", type=int, default=43287974328)
    sp.add_argument("--zero-bytes", type=int, default=2)
    sp.add_argument("--out", default="input.json")
    sp.add_argument("--spend-out")
    sp.set_defaults(fn=cmd_gen_input)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
