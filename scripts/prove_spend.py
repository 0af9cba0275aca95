"""End-to-end Groth16 proof of the Spend circuit on TPU (SURVEY.md §7.2's
minimum slice): build the R1CS, run the trusted setup on device, generate the
witness on device from the recorded fixture (tests/test_spend_input.json twin),
prove, verify with the host pairing, and emit toolchain artifacts
(spend.r1cs, spend.wtns, proof.json, public.json).

Usage: python scripts/prove_spend.py [outdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: the mont-limb graphs dominate cold-start time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pob_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pob_artifacts"
    os.makedirs(outdir, exist_ok=True)

    from pob_tpu.field import limb
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment
    from pob_tpu.prover import groth16, serialize
    from pob_tpu.r1cs.spend_circuit import build_spend_cs, spend_full_witness

    print("device:", jax.devices()[0], flush=True)

    t0 = time.time()
    cs = build_spend_cs()
    print(
        f"r1cs built: {cs.num_constraints} constraints, {cs.num_wires} wires "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )

    fix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "spend_input.json",
    )
    case = load_spend_input(fix)
    expected = spend_expected_commitment(case)

    t0 = time.time()
    args = [
        jnp.asarray(limb.int_to_limbs(case[k] % FR_MOD))[None]
        for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
    ]
    witness = np.asarray(jax.jit(spend_full_witness)(*args))[0]
    print(f"witness generated on device ({time.time()-t0:.1f}s)", flush=True)
    commitment = limb.limbs_to_int(witness[1])
    assert commitment == expected, "device commitment != golden model"

    t0 = time.time()
    pk, vk = groth16.setup(cs)
    print(f"setup done, domain 2^{pk.k} ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    proof = groth16.prove(pk, witness)
    print(f"proof computed ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    ok = groth16.verify(vk, proof, [commitment])
    print(f"verify: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok, "proof must verify"
    bad = groth16.verify(vk, proof, [(commitment + 1) % FR_MOD])
    assert not bad, "wrong public input must not verify"

    # second proof timing (no recompile)
    t0 = time.time()
    proof2 = groth16.prove(pk, witness)
    dt = time.time() - t0
    print(f"steady-state prove: {dt:.2f}s ({1/dt:.3f} proofs/s/chip)", flush=True)
    assert groth16.verify(vk, proof2, [commitment])

    serialize.write_r1cs(os.path.join(outdir, "spend.r1cs"), cs)
    serialize.write_wtns(
        os.path.join(outdir, "spend.wtns"),
        limb.limb_rows_to_ints(witness),
    )
    serialize.write_proof(os.path.join(outdir, "proof.json"), proof, [commitment])
    print("artifacts written to", outdir, flush=True)
    print("SPEND GROTH16 E2E OK", flush=True)


if __name__ == "__main__":
    main()
