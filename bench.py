"""Headline benchmark: batched ProofOfBurn witness generation + public
commitment on one TPU chip, prod-scale circuit config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); its witness path
is the circom-generated single-threaded C++ binary (Makefile:5-6) evaluating
~1.7e7 BN254 constraint ops per proof — about 1 proof/s/core for a
rapidsnark-class witness generator (SURVEY.md §6 derivation). vs_baseline is
measured proofs/sec/chip against that 1.0 proofs/s estimate."""

import json
import os
import sys
import time

import numpy as np

BASELINE_WITNESS_PROOFS_PER_SEC = 1.0  # single-core C++ witness gen (est.)


def main():
    import jax
    import jax.numpy as jnp

    from pob_tpu.circuits.proof_of_burn import PROD_CONFIG, pob_forward
    from pob_tpu.harness.inputs import batch_stack, load_pob_input, widen_pob_input

    fix = os.path.join(os.path.dirname(__file__), "tests", "fixtures", "pob_input.json")
    raw = json.load(open(fix))
    # widen the recorded test-config fixture to the prod instantiation
    # ProofOfBurn(16, 4, 16, 50, 31, 2, ...) (main_proof_of_burn.circom:26)
    wide = widen_pob_input(raw, PROD_CONFIG)
    inp = load_pob_input(wide, PROD_CONFIG)

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "7"))
    kwargs = batch_stack([inp] * batch)

    # distinct inputs per iteration (the tunnel runtime memoizes identical
    # executions) — vary _proofExtraCommitment, which changes every
    # commitment but keeps the witness valid
    def make(it):
        pec = np.zeros((batch, 16), np.uint32)
        pec[:, 0] = np.arange(batch) + it * batch + 1
        d = dict(kwargs)
        d["proof_extra_commitment"] = pec
        return {k: jnp.asarray(v) for k, v in d.items()}

    fn = jax.jit(lambda kw: pob_forward(PROD_CONFIG, **kw))
    warm = fn(make(10_000))
    np.asarray(warm["commitment"])  # compile + warm, force completion

    times = []
    for it in range(iters):
        arrs = make(it)
        t0 = time.perf_counter()
        out = fn(arrs)
        np.asarray(out["commitment"])[0, 0]  # host fetch forces completion
        times.append(time.perf_counter() - t0)
    assert bool(np.asarray(out["valid"]).all()), "witness must validate"
    dt = sorted(times)[len(times) // 2]  # median

    proofs_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "pob_witness_commitments_per_sec_per_chip",
                "value": round(proofs_per_sec, 3),
                "unit": "proofs/s",
                "vs_baseline": round(proofs_per_sec / BASELINE_WITNESS_PROOFS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
