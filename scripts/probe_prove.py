"""Stage-by-stage synchronous Groth16 prove probe on the real chip.

Runs the exact bench prove stage (pk + witness batches from
BENCH_CACHE_DIR), but with a block_until_ready barrier and a progress line
after EVERY device program, so a TPU-worker crash is attributable to one
specific stage instead of surfacing at the final result fetch
(BENCH_r04's failure mode: crash reported at groth16.py finish_proof ->
curve.to_affine_host, with no information about which queued program
faulted).

    python scripts/probe_prove.py [B] [circuit]

Env: BENCH_CACHE_DIR (default /tmp/pob_bench_cache), POB_NO_PLAN,
PROBE_SYNC=0 to skip the per-stage barriers (reproduces the bench's
original async dispatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pob_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

CACHE = os.environ.get("BENCH_CACHE_DIR", "/tmp/pob_bench_cache")
_T0 = time.perf_counter()


def log(msg):
    print(f"[probe +{time.perf_counter()-_T0:.1f}s] {msg}", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tag = sys.argv[2] if len(sys.argv) > 2 else "spend_k18"
    sync = os.environ.get("PROBE_SYNC", "1") == "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.prover import groth16
    from pob_tpu.utils.cache import pin_platform

    pin_platform()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    pk, vk = groth16.load_pk(os.path.join(CACHE, f"{tag}.npz"))
    data = np.load(os.path.join(CACHE, f"{tag}_W.npz"))
    import json

    pubs_all = json.load(open(os.path.join(CACHE, f"{tag}_pubs.json")))
    W = jnp.asarray(data["W0"][:B])
    pubs = pubs_all[0][:B]
    log(f"pk loaded k={pk.k} nw={int(pk.a_query[0].shape[0])} W={tuple(W.shape)}")

    fetch_each = os.environ.get("PROBE_FETCH_EACH", "0") == "1"

    def barrier(name, x):
        if sync:
            jax.block_until_ready(x)
        log(f"{name} {'done' if sync else 'dispatched'}")
        if fetch_each and name != "h":
            # small (B,16)-limb sums: fetch NOW to detect a dead worker at
            # the stage that killed it, not at the end-of-prove fold
            host = jax.tree_util.tree_map(lambda c: np.asarray(c), x)
            log(f"{name} fetched ok")
            return host if os.environ.get("PROBE_KEEP_HOST", "1") == "1" else x
        return x

    n_tiles = max(8, 64 // max(1, B))
    npub = pk.num_public

    t0 = time.perf_counter()
    h = barrier("h", groth16._h_batch_kernel(pk.k, pk.mats, W))
    a_sum = barrier("a", groth16._msm_batch_kernel("g1", n_tiles, pk.a_query, W))
    b1_sum = barrier("b1", groth16._msm_batch_kernel("g1", n_tiles, pk.b1_query, W))
    b2_sum = barrier("b2", groth16._msm_batched("g2", pk.b2_query, W))
    c_l = barrier(
        "cl", groth16._msm_batch_kernel("g1", n_tiles, pk.l_query, W[:, npub + 1 :])
    )
    c_h = barrier("ch", groth16._msm_batch_kernel("g1", n_tiles, pk.h_query, h))
    log(f"all stages complete ({time.perf_counter()-t0:.1f}s incl. compile)")

    sums = (a_sum, b1_sum, b2_sum, c_l, c_h)
    # fetch ALL sums host-side in one go; per-proof device slicing
    # (tree_map c[i] over jax arrays) dispatches B x 15 one-off slice
    # programs and crashes the tunnel worker (r04's failure mode)
    host_sums = jax.tree_util.tree_map(lambda c: np.asarray(c), sums)
    log("sums fetched to host")
    proofs = []
    for i in range(B):
        si = jax.tree_util.tree_map(lambda c: c[i], host_sums)
        proofs.append(groth16.finish_proof(pk, si))
    log("proofs folded")
    from pob_tpu.field.ref import FR_MOD

    assert groth16.verify(vk, proofs[0], [pubs[0]]), "proof 0 must verify"
    assert not groth16.verify(vk, proofs[0], [(pubs[0] + 1) % FR_MOD])
    log(f"verified OK (B={B})")

    # warm re-run for the timing number
    t0 = time.perf_counter()
    h = groth16._h_batch_kernel(pk.k, pk.mats, W)
    a_sum = groth16._msm_batch_kernel("g1", n_tiles, pk.a_query, W)
    b1_sum = groth16._msm_batch_kernel("g1", n_tiles, pk.b1_query, W)
    b2_sum = groth16._msm_batched("g2", pk.b2_query, W)
    c_l = groth16._msm_batch_kernel("g1", n_tiles, pk.l_query, W[:, npub + 1 :])
    c_h = groth16._msm_batch_kernel("g1", n_tiles, pk.h_query, h)
    jax.block_until_ready((h, a_sum, b1_sum, b2_sum, c_l, c_h))
    dt = time.perf_counter() - t0
    print(f"OK prove B={B} warm={dt:.2f}s ({B/dt:.2f} proofs/s device-side)",
          flush=True)


if __name__ == "__main__":
    main()
