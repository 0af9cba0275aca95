"""Build and check the PRODUCTION ProofOfBurn R1CS (VERDICT r3 item 3).

ProofOfBurn(16, 4, 16, 50, 31, 2, 10**19, 10**20) — the reference's prod
instantiation (/root/reference/circuits/main_proof_of_burn.circom:26). This
script builds the full constraint system, generates the device witness for
the recorded fixture widened to prod shapes (widen_pob_input pads unused MPT
layers with the reference generator's dummy lens, tests/main.py:148-150),
checks every constraint host-side, emits the .wtns, and writes a
PROD_R1CS.json artifact with counts and timings.

    python scripts/prod_r1cs_report.py --out PROD_R1CS.json [--wtns /tmp/pob_prod.wtns]

Memory note: the witness buffer is (num_wires, 16) u32 (~1.3 GB at ~2e7
wires) plus the host int list for check_witness; run on a box with >= 16 GB.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROD_R1CS.json")
    ap.add_argument("--wtns", default="")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the host-side constraint check (build+witness only)")
    args = ap.parse_args()

    t_all = time.perf_counter()
    from pob_tpu.utils.cache import enable_persistent_cache, pin_platform

    enable_persistent_cache()
    import jax

    pin_platform()
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb
    from pob_tpu.circuits.proof_of_burn import PROD_CONFIG
    from pob_tpu.harness.inputs import (
        batch_stack, load_pob_input, pob_expected_commitment, widen_pob_input,
    )
    from pob_tpu.r1cs.pob_circuit import build_pob_cs, pob_r1cs_witness
    from pob_tpu.r1cs.spend_circuit import assemble_witness

    rep = {"config": "ProofOfBurn(16, 4, 16, 50, 31, 2, 10**19, 10**20)",
           "reference": "circuits/main_proof_of_burn.circom:26",
           "backend": jax.default_backend()}

    t0 = time.perf_counter()
    cs = build_pob_cs(PROD_CONFIG)
    rep["build_s"] = round(time.perf_counter() - t0, 1)
    nnz = sum(int(sum(len(c) for c in coo.rows)) for coo in (cs.a, cs.b, cs.c))
    rep.update(num_constraints=cs.num_constraints, num_wires=cs.num_wires,
               nnz_total=nnz, palette_size=len(cs.palette),
               domain_k=(cs.num_constraints + cs.num_public).bit_length())
    print(f"[prod] cs built in {rep['build_s']}s: "
          f"{cs.num_constraints} constraints, {cs.num_wires} wires, "
          f"{nnz} nnz (survey estimate was ~1.7e7)", flush=True)

    fix = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "pob_input.json")
    raw = widen_pob_input(json.load(open(fix)), PROD_CONFIG)
    inp = load_pob_input(raw, PROD_CONFIG)
    kw = {k: jnp.asarray(v) for k, v in batch_stack([inp]).items()}
    t0 = time.perf_counter()
    blocks = pob_r1cs_witness(PROD_CONFIG, **kw)
    buf = np.asarray(assemble_witness(cs, blocks))
    rep["witness_s"] = round(time.perf_counter() - t0, 1)
    print(f"[prod] witness built in {rep['witness_s']}s: shape {buf.shape}",
          flush=True)

    t0 = time.perf_counter()
    w = limb.limb_rows_to_ints(buf[0])
    rep["witness_decode_s"] = round(time.perf_counter() - t0, 1)

    expected = pob_expected_commitment(raw, PROD_CONFIG)
    rep["commitment_ok"] = bool(w[1] == expected)
    assert rep["commitment_ok"], "public commitment must match the golden model"
    print("[prod] golden commitment matches", flush=True)

    if not args.skip_check:
        t0 = time.perf_counter()
        ok = cs.check_witness(w)
        rep["check_s"] = round(time.perf_counter() - t0, 1)
        rep["check_ok"] = bool(ok)
        assert ok, f"constraints violated: {cs.failing_constraints(w)}"
        print(f"[prod] all {cs.num_constraints} constraints satisfied "
              f"({rep['check_s']}s)", flush=True)

    if args.wtns:
        from pob_tpu.prover.serialize import write_wtns

        t0 = time.perf_counter()
        write_wtns(args.wtns, w)
        rep["wtns_s"] = round(time.perf_counter() - t0, 1)
        rep["wtns_bytes"] = os.path.getsize(args.wtns)
        print(f"[prod] wtns written: {rep['wtns_bytes']} bytes", flush=True)

    rep["total_s"] = round(time.perf_counter() - t_all, 1)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=2)
        f.write("\n")
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
