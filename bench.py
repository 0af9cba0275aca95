"""Headline benchmark: batched end-to-end Groth16 proving on one TPU chip —
witness generation -> QAP division (h) -> all five MSMs -> proof fold, with
self-verification asserted — on the Spend circuit (spend.circom:32-53,
~1.6e5 constraints, NTT domain 2^18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference delegates proving to snarkjs/rapidsnark
(Makefile:5-6, README.md:50-66) and publishes no numbers (BASELINE.md).
vs_baseline is measured against an estimated 1.0 proofs/s for single-core
rapidsnark on a 2^18-constraint system (rapidsnark proves ~10^5-10^6
constraints/s/core; BASELINE.json's north star asks for >= 20x that,
per chip, snarkjs-compatible).

Environment knobs: BENCH_BATCH (default 16), BENCH_ITERS (default 5),
BENCH_VERIFY (default 4: proofs per iteration to pairing-verify on host)."""

import json
import os
import time

import numpy as np

BASELINE_PROVE_PER_SEC = 1.0  # single-core rapidsnark on ~2^18 constraints (est.)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit backend choice even when a plugin sitecustomize
        # force-set another default (the axon TPU plugin does)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from pob_tpu.field import limb
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment
    from pob_tpu.prover import groth16
    from pob_tpu.r1cs.spend_circuit import (
        assemble_witness,
        build_spend_cs,
        spend_witness,
    )
    from pob_tpu.utils.metrics import MetricsRegistry

    import sys

    def log(msg):
        print(f"[bench +{time.perf_counter()-_T0:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    _T0 = time.perf_counter()
    metrics = MetricsRegistry()
    fix = os.path.join(os.path.dirname(__file__), "tests", "fixtures",
                       "spend_input.json")
    base = load_spend_input(fix)

    log(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    with metrics.stage("build_cs"):
        cs = build_spend_cs()
    log(f"cs built: {cs.num_constraints} constraints")
    with metrics.stage("setup") as h:
        pk, vk = groth16.setup(cs)
        h["out"] = pk.h_query
    log(f"setup done: domain 2^{pk.k}")

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n_verify = int(os.environ.get("BENCH_VERIFY", "4"))

    def witnesses(it):
        """Distinct instances per iteration (the tunnel runtime memoizes
        identical executions): vary extraCommitment per lane."""
        cases = [
            dict(base, extra_commitment=base["extra_commitment"] + it * batch + i)
            for i in range(batch)
        ]
        args = [
            jnp.asarray(np.stack([limb.int_to_limbs(c[k] % FR_MOD) for c in cases]))
            for k in ("burn_key", "balance", "withdrawn", "extra_commitment")
        ]
        return assemble_witness(cs, jax.jit(spend_witness)(*args)), cases

    with metrics.stage("warmup_compile"):
        W, _ = witnesses(10_000)
        jax.block_until_ready(W)
        log(f"witness batch ready {tuple(W.shape)}; compiling prove_batch")
        proofs = groth16.prove_batch(pk, W)
    log("warmup done")

    times = []
    all_proofs = None
    all_cases = None
    for it in range(iters):
        # end-to-end per iteration: witness generation -> h -> 5 MSMs -> proof
        t0 = time.perf_counter()
        W, cases = witnesses(it)
        proofs = groth16.prove_batch(pk, W)
        times.append(time.perf_counter() - t0)
        all_proofs, all_cases = proofs, cases
        metrics.count("proofs", batch)

    with metrics.stage("verify"):
        for i in range(min(n_verify, batch)):
            pub = [spend_expected_commitment(all_cases[i])]
            assert groth16.verify(vk, all_proofs[i], pub), f"proof {i} must verify"
            bad = [(pub[0] + 1) % FR_MOD]
            assert not groth16.verify(vk, all_proofs[i], bad)

    dt = sorted(times)[len(times) // 2]  # median
    proofs_per_sec = batch / dt
    summary = metrics.report()
    summary["batch"] = batch
    summary["domain_k"] = pk.k
    summary["num_constraints"] = cs.num_constraints
    print(
        json.dumps(
            {
                "metric": "groth16_spend_proofs_per_sec_per_chip",
                "value": round(proofs_per_sec, 3),
                "unit": "proofs/s",
                "vs_baseline": round(proofs_per_sec / BASELINE_PROVE_PER_SEC, 3),
            }
        )
    )
    import sys

    print(json.dumps({"detail": summary}), file=sys.stderr)


if __name__ == "__main__":
    main()
