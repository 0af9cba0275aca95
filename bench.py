"""Headline benchmark: batched end-to-end Groth16 proving on one TPU chip —
witness generation -> QAP division (h) -> all five MSMs -> proof fold, with
self-verification asserted — on the Spend circuit (spend.circom:32-53,
~1.6e5 constraints, NTT domain 2^18), plus a ProofOfBurn (TEST_CONFIG,
proof_of_burn.circom:34 at testcases/proof_of_burn.py:54 scale) stage
reported in the stderr detail.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference delegates proving to snarkjs/rapidsnark
(Makefile:5-6, README.md:50-66) and publishes no numbers (BASELINE.md).
vs_baseline is measured against an estimated 1.0 proofs/s for single-core
rapidsnark on a 2^18-constraint system (rapidsnark proves ~10^5-10^6
constraints/s/core; BASELINE.json's north star asks for >= 20x that,
per chip, snarkjs-compatible).

Architecture (hard-won, rounds 3-5): the tunnel's TPU worker dies when one
process accumulates too many large compiled programs — every monolithic
bench attempt (setup + witness + prove in one process) crashed with "TPU
worker process crashed or restarted", while processes compiling <= ~5
programs always survived. So the bench runs as an ORCHESTRATOR spawning one
subprocess per stage, with on-disk handoff:

  setup   -> proving key        (BENCH_CACHE_DIR/<tag>.npz, ~10 programs)
  witness -> witness batches    (<tag>_W.npy + publics, 1-2 programs)
  prove   -> proofs + timings   (h + plain Pippenger G1 MSMs + chunked G2,
                                 each synchronized and logged per stage)

The prove stage defaults to the PLAIN path (per-query Pippenger G1 +
chunked G2): smaller programs the tunnel backend compiles reliably. The
width-classified all-bits plan (~30x fewer point-adds) is the opt-in
first attempt under BENCH_TRY_PLAN=1 (its fused G1 mega-program has killed
the tunnel's remote-compile endpoint before), with the plain path as
fallback; POB_NO_PLAN=1 forces the plain path inside a prove process.

The orchestrator keeps a GLOBAL wall-clock budget (BENCH_WALL_BUDGET,
default 2800 s): per-stage timeouts shrink to the remaining budget, the PoB
stage is skipped when spend has consumed it, and the headline (plus any
completed stage detail) is emitted from whatever finished even when a later
stage fails — r04 lost measured witness numbers by printing only at the
very end.

Each stage is retried on failure; the pk/W caches mean a retry never repeats
completed work. The headline proofs/s counts witness generation AND proving
(batch / (witness_s + prove_s), medians across iterations).

Environment knobs: BENCH_BATCH (default 16), BENCH_ITERS (default 5),
BENCH_VERIFY (default 4), BENCH_POB (default 1), BENCH_POB_BATCH (default
4), BENCH_POB_ITERS (default 3), BENCH_CACHE_DIR (default
/tmp/pob_bench_cache), BENCH_TIMEOUT (seconds per stage attempt, default
2700), BENCH_WALL_BUDGET (global seconds, default 2800), BENCH_TRY_PLAN,
POB_NO_PLAN."""

import json
import os
import subprocess
import sys
import time

BASELINE_PROVE_PER_SEC = 1.0  # single-core rapidsnark on ~2^18 constraints (est.)

_T0 = time.perf_counter()
CACHE = os.environ.get("BENCH_CACHE_DIR", "/tmp/pob_bench_cache")


def log(msg):
    print(f"[bench +{time.perf_counter()-_T0:.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(obj):
    print(json.dumps(obj), flush=True)


# ---------------------------------------------------------------------------
# circuit adapters
# ---------------------------------------------------------------------------


def _spend_parts():
    from pob_tpu.r1cs.spend_circuit import build_spend_cs

    return build_spend_cs()


def _spend_witnesses(cs, batch, it):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.harness.inputs import load_spend_input, spend_expected_commitment
    from pob_tpu.r1cs.spend_circuit import assemble_witness, spend_witness

    fix = os.path.join(os.path.dirname(__file__), "tests", "fixtures",
                       "spend_input.json")
    base = load_spend_input(fix)
    cases = [dict(base, extra_commitment=base["extra_commitment"] + it * batch + i)
             for i in range(batch)]
    args = [jnp.asarray(np.stack([limb.int_to_limbs(c[k] % FR_MOD) for c in cases]))
            for k in ("burn_key", "balance", "withdrawn", "extra_commitment")]
    W = assemble_witness(cs, jax.jit(spend_witness)(*args))
    pubs = [spend_expected_commitment(c) for c in cases]
    return W, pubs


def _pob_parts():
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.r1cs.pob_circuit import build_pob_cs

    return build_pob_cs(TEST_CONFIG)


def _pob_witnesses(cs, batch, it):
    import jax.numpy as jnp

    from pob_tpu.field import limb
    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.circuits.proof_of_burn import TEST_CONFIG
    from pob_tpu.harness.inputs import (
        batch_stack, load_pob_input, pob_expected_commitment,
    )
    from pob_tpu.r1cs.pob_circuit import pob_r1cs_witness
    from pob_tpu.r1cs.spend_circuit import assemble_witness

    fix = os.path.join(os.path.dirname(__file__), "tests", "fixtures",
                       "pob_input.json")
    raw = json.load(open(fix))
    base = load_pob_input(fix, TEST_CONFIG)
    pec0 = int(raw.get("_proofExtraCommitment", 0))
    pecs = [(pec0 + 1 + it * batch + i) % FR_MOD for i in range(batch)]
    cases = [dict(base, proof_extra_commitment=limb.int_to_limbs(p)) for p in pecs]
    kw = {k: jnp.asarray(v) for k, v in batch_stack(cases).items()}
    W = assemble_witness(cs, pob_r1cs_witness(TEST_CONFIG, **kw))
    pubs = [pob_expected_commitment(dict(raw, _proofExtraCommitment=p), TEST_CONFIG)
            for p in pecs]
    return W, pubs


_CIRCUITS = {
    "spend": (_spend_parts, _spend_witnesses, "spend_k18",
              "BENCH_BATCH", "BENCH_ITERS"),
    "pob": (_pob_parts, _pob_witnesses, "pob_test_k",
            "BENCH_POB_BATCH", "BENCH_POB_ITERS"),
}


# ---------------------------------------------------------------------------
# stages (each runs in its own subprocess)
# ---------------------------------------------------------------------------


def _stage_setup(circuit):
    import jax  # noqa: F401

    from pob_tpu.prover import groth16

    build_cs, _wit, tag, _bk, _ik = _CIRCUITS[circuit]
    path = os.path.join(CACHE, f"{tag}.npz")
    if os.path.exists(path):
        _emit({"stage": "setup", "cached": True})
        return
    t0 = time.perf_counter()
    cs = build_cs()
    t_cs = time.perf_counter() - t0
    log(f"setup[{circuit}]: cs built ({cs.num_constraints} constraints, {t_cs:.1f}s)")
    t0 = time.perf_counter()
    # plan=False: save_pk drops the classified-MSM plan; the prove stage
    # builds and caches it itself (attach_msm_plan cache_path), so building
    # it here would be discarded work
    pk, vk = groth16.setup(cs, plan=False)
    t_setup = time.perf_counter() - t0
    log(f"setup[{circuit}]: done (domain 2^{pk.k}, {t_setup:.1f}s)")
    os.makedirs(CACHE, exist_ok=True)
    t0 = time.perf_counter()
    groth16.save_pk(path, pk, vk)
    _emit({"stage": "setup", "cached": False, "cs_build_s": round(t_cs, 2),
           "setup_s": round(t_setup, 2),
           "pk_write_s": round(time.perf_counter() - t0, 2),
           "domain_k": pk.k, "num_constraints": cs.num_constraints})


def _stage_witness(circuit):
    import jax
    import numpy as np

    build_cs, witnesses, tag, bk, ik = _CIRCUITS[circuit]
    batch = int(os.environ.get(bk, "16" if circuit == "spend" else "4"))
    iters = int(os.environ.get(ik, "5" if circuit == "spend" else "3"))
    cs = build_cs()
    times = []
    arrays = {}
    pubs_all = []
    # iteration 10_000 is the warmup/compile batch
    for n, it in enumerate([10_000] + list(range(iters))):
        t0 = time.perf_counter()
        W, pubs = witnesses(cs, batch, it)
        jax.block_until_ready(W)
        dt = time.perf_counter() - t0
        if n:
            times.append(dt)
            arrays[f"W{n-1}"] = np.asarray(W)
            pubs_all.append(pubs)
        log(f"witness[{circuit}]: iter {it} {dt:.2f}s")
    os.makedirs(CACHE, exist_ok=True)
    with open(os.path.join(CACHE, f"{tag}_W.npz"), "wb") as f:
        np.savez(f, **arrays)
    json.dump(pubs_all, open(os.path.join(CACHE, f"{tag}_pubs.json"), "w"))
    med = sorted(times)[len(times) // 2]
    _emit({"stage": "witness", "batch": batch, "iters": iters,
           "witness_s": round(med, 3),
           "iter_s": [round(t, 3) for t in times]})


def _stage_prove(circuit):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field.ref import FR_MOD
    from pob_tpu.prover import groth16

    build_cs, _wit, tag, bk, _ik = _CIRCUITS[circuit]
    n_verify = int(os.environ.get("BENCH_VERIFY", "4"))
    cs = build_cs()
    pk, vk = groth16.load_pk(os.path.join(CACHE, f"{tag}.npz"))
    no_plan = os.environ.get("POB_NO_PLAN", "0") == "1"
    if not no_plan:
        groth16.attach_msm_plan(pk, cs,
                                cache_path=os.path.join(CACHE, f"{tag}_plan.npz"))
    log(f"prove[{circuit}]: pk loaded (domain 2^{pk.k}, plan={not no_plan})")
    data = np.load(os.path.join(CACHE, f"{tag}_W.npz"))
    pubs_all = json.load(open(os.path.join(CACHE, f"{tag}_pubs.json")))
    # the witness stage saves BENCH_ITERS batches; proving every one of them
    # can exceed the wall budget on the plain (scatter-bound) path, so the
    # prove stage times at most BENCH_PROVE_ITERS of them
    iters = min(len(pubs_all), int(os.environ.get("BENCH_PROVE_ITERS", "3")))
    W0 = jnp.asarray(data["W0"])
    log(f"prove[{circuit}]: warmup compile, W {tuple(W0.shape)}")
    t0 = time.perf_counter()
    # warmup runs with per-stage barriers + logs so a worker crash is
    # attributable to one stage; timed iterations run fully async
    os.environ["POB_PROVE_SYNC"] = "1"
    proofs = groth16.prove_batch(pk, W0)
    os.environ["POB_PROVE_SYNC"] = "0"
    warm_s = time.perf_counter() - t0
    log(f"prove[{circuit}]: warmup done ({warm_s:.1f}s)")
    times = []
    last = None
    for n in range(iters):
        W = jnp.asarray(data[f"W{n}"])
        t0 = time.perf_counter()
        proofs = groth16.prove_batch(pk, W)
        dt = time.perf_counter() - t0
        times.append(dt)
        last = (proofs, pubs_all[n])
        log(f"prove[{circuit}]: iter {n} {dt:.2f}s "
            f"({len(pubs_all[n])/dt:.2f} proofs/s)")
    t0 = time.perf_counter()
    proofs, pubs = last
    for i in range(min(n_verify, len(pubs))):
        assert groth16.verify(vk, proofs[i], [pubs[i]]), f"proof {i} must verify"
        assert not groth16.verify(vk, proofs[i], [(pubs[i] + 1) % FR_MOD])
    verify_s = time.perf_counter() - t0
    med = sorted(times)[len(times) // 2]
    _emit({"stage": "prove", "batch": int(W0.shape[0]), "iters": iters,
           "prove_s": round(med, 3), "warmup_s": round(warm_s, 1),
           "verify_s": round(verify_s, 1), "domain_k": pk.k, "plan": not no_plan,
           "iter_s": [round(t, 3) for t in times], "verified": True})


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _budget_left() -> float:
    budget = float(os.environ.get("BENCH_WALL_BUDGET", "2800"))
    return budget - (time.perf_counter() - _T0)


def _run_stage(circuit, stage, extra_env=None, attempts=2):
    timeout = float(os.environ.get("BENCH_TIMEOUT", "2700"))
    for i in range(attempts):
        left = _budget_left()
        if left < 90:
            log(f"stage {circuit}:{stage} skipped: {left:.0f}s of wall budget left")
            return None
        env = dict(os.environ, BENCH_STAGE=f"{circuit}:{stage}", **(extra_env or {}))
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, text=True,
                timeout=min(timeout, left - 30),
            )
        except subprocess.TimeoutExpired:
            log(f"stage {circuit}:{stage} attempt {i} timed out")
            continue
        lines = [l for l in (p.stdout or "").splitlines()
                 if l.startswith('{"stage"')]
        if p.returncode == 0 and lines:
            return json.loads(lines[-1])
        log(f"stage {circuit}:{stage} attempt {i} failed rc={p.returncode}")
    return None


def _bench_circuit(circuit):
    detail = {}
    st = _run_stage(circuit, "setup")
    if st is None:
        return None, detail
    detail["setup"] = st
    wt = _run_stage(circuit, "witness")
    if wt is None:
        return None, detail
    detail["witness"] = wt
    # Default prove path: the width-classified all-bits plan — bitsum_msm is
    # scatter-free (dense conditional adds over wide tiles), which matters
    # because XLA:TPU serializes Pippenger's bucket scatter at ~1-2us/index
    # (r05 probe_msm bisection; the r03/r04 worker kills were launches whose
    # scatter count exceeded the worker's ~minute execution window). The
    # plan's G1 program runs split per query (POB_PLAN_SPLIT=1 default) to
    # stay under the tunnel compiler's limit; every plain Pippenger launch
    # (incl. the h MSM both paths share) is batch-chunked to a bounded
    # scatter count (groth16._msm_batched). BENCH_TRY_PLAN=0 skips the
    # planned attempt; the chunked plain path remains the fallback.
    pv = None
    if os.environ.get("BENCH_TRY_PLAN", "1") == "1":
        # force the plan on explicitly so an ambient POB_NO_PLAN=1 can't
        # silently turn the "planned" attempt into a duplicate plain run
        pv = _run_stage(circuit, "prove", extra_env={"POB_NO_PLAN": "0"},
                        attempts=1)
        if pv is None:
            log(f"{circuit}: planned prove failed; falling back to POB_NO_PLAN=1")
    if pv is None:
        # safety-net attempt: the r05-proven configuration (chunked scatter
        # Pippenger, no plan) — force dense OFF so a dense-path fault cannot
        # take down both attempts
        pv = _run_stage(circuit, "prove",
                        extra_env={"POB_NO_PLAN": "1", "POB_MSM_DENSE": "0"})
    if pv is None:
        return None, detail
    detail["prove"] = pv
    batch = pv["batch"]
    e2e = wt["witness_s"] + pv["prove_s"]
    detail["proofs_per_sec_e2e"] = round(batch / e2e, 3)
    detail["proofs_per_sec_prove_only"] = round(batch / pv["prove_s"], 3)
    return batch / e2e, detail


def main():
    stage = os.environ.get("BENCH_STAGE")
    if stage:
        from pob_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        import jax

        if os.environ.get("JAX_PLATFORMS"):
            # honor an explicit backend choice even when a plugin
            # sitecustomize force-set another default (the axon plugin does)
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        circuit, name = stage.split(":")
        {"setup": _stage_setup, "witness": _stage_witness,
         "prove": _stage_prove}[name](circuit)
        return

    spend_rate, spend_detail = _bench_circuit("spend")
    print(json.dumps({"detail": {"spend": spend_detail}}), file=sys.stderr,
          flush=True)
    if os.environ.get("BENCH_POB", "1") == "1":
        # a cold PoB setup (3.97M constraints, domain 2^22) runs to hours on
        # the tunnel backend — attempting it on a residual budget just burns
        # the clock (r04); require a cached pk unless the budget is generous
        pob_cached = os.path.exists(os.path.join(CACHE, "pob_test_k.npz"))
        need = 300 if pob_cached else 1800
        if _budget_left() < need:
            log(f"pob stage skipped: {_budget_left():.0f}s of wall budget "
                f"left (need {need}; pk cached={pob_cached})")
        else:
            try:
                _pob_rate, pob_detail = _bench_circuit("pob")
                print(json.dumps({"pob_detail": pob_detail}), file=sys.stderr,
                      flush=True)
            except Exception as e:  # PoB must not take down the headline
                log(f"pob stage failed (headline unaffected): "
                    f"{type(e).__name__}: {e}")
    if spend_rate is not None:
        print(
            json.dumps(
                {
                    "metric": "groth16_spend_proofs_per_sec_per_chip",
                    "value": round(spend_rate, 3),
                    "unit": "proofs/s",
                    "vs_baseline": round(spend_rate / BASELINE_PROVE_PER_SEC, 3),
                }
            ),
            flush=True,
        )
        return
    # partial emission: a failed prove must not discard measured stages
    # (r04 had witness_s=0.132 for B=16 and printed nothing)
    wt = spend_detail.get("witness")
    if wt:
        rate = wt["batch"] / wt["witness_s"]
        log("prove stage incomplete; emitting witness-only headline")
        print(
            json.dumps(
                {
                    "metric": "spend_witness_commitments_per_sec_per_chip",
                    "value": round(rate, 3),
                    "unit": "witness/s",
                    "vs_baseline": round(rate / BASELINE_PROVE_PER_SEC, 3),
                }
            ),
            flush=True,
        )
        sys.exit(1)
    log("spend bench failed in all attempts")
    sys.exit(1)


if __name__ == "__main__":
    main()
