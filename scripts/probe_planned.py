"""Probe the width-classified (planned) batched prover on the real TPU using
the cached proving key: per-stage timings + end-to-end proofs/s at BENCH_BATCH.

    python scripts/probe_planned.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pob_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    t0 = time.perf_counter()

    def log(msg):
        print(f"[probe +{time.perf_counter()-t0:.1f}s] {msg}", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment
    from pob_tpu.prover import groth16
    from pob_tpu.r1cs.spend_circuit import assemble_witness, build_spend_cs, spend_witness

    B = int(os.environ.get("BENCH_BATCH", "16"))
    cs = build_spend_cs()
    pk, vk = groth16.load_pk("/tmp/pob_bench_cache/spend_k18.npz")
    groth16.attach_msm_plan(pk, cs)
    q = pk.plan.queries
    for name in ("a", "b1", "b2", "l"):
        log(f"{name}: bit={int(q[name]['bit'][0][0].shape[0])} "
            f"full={int(q[name]['full'][0][0].shape[0])}")

    fix = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "spend_input.json")
    base = load_spend_input(fix)

    def witnesses(it):
        cases = [dict(base, extra_commitment=base["extra_commitment"] + it * B + i)
                 for i in range(B)]
        args = [jnp.asarray(np.stack([limb.int_to_limbs(c[k] % FR_MOD) for c in cases]))
                for k in ("burn_key", "balance", "withdrawn", "extra_commitment")]
        return assemble_witness(cs, jax.jit(spend_witness)(*args)), cases

    W, _ = witnesses(999)
    jax.block_until_ready(W)
    log(f"witness ready {tuple(W.shape)}; warmup prove_batch (planned)")
    proofs = groth16.prove_batch(pk, W)
    log("warmup done")
    times = []
    for it in range(3):
        t1 = time.perf_counter()
        W, cases = witnesses(it)
        proofs = groth16.prove_batch(pk, W)
        times.append(time.perf_counter() - t1)
        log(f"iter {it}: {times[-1]:.2f}s ({B/times[-1]:.2f} proofs/s)")
    pub = [spend_expected_commitment(cases[0])]
    assert groth16.verify(vk, proofs[0], pub), "planned proof must verify"
    assert not groth16.verify(vk, proofs[0], [(pub[0] + 1) % FR_MOD])
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({"planned_proofs_per_sec": round(B / dt, 3), "batch": B,
                      "iter_s": [round(t, 2) for t in times]}), flush=True)


if __name__ == "__main__":
    main()
