"""Bisect the silent TPU worker death around the batched Pippenger MSM.

probe_prove r05 evidence: every prove-stage program 'completes'
(block_until_ready returns), but the FIRST device->host fetch afterwards
raises UNAVAILABLE — i.e. the worker died (and possibly restarted) during
one of the programs and block_until_ready did not surface it. This probe
interleaves a host fetch after every step to find the killer program:

    python scripts/probe_fetch.py [B] [stages...]

stages default: sanity h fetch-h a fetch-a
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
    print(f"[fetch-probe +{time.perf_counter()-_T0:.1f}s] {msg}", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.prover import groth16
    from pob_tpu.utils.cache import pin_platform

    pin_platform()
    log(f"backend={jax.default_backend()}")

    # 0. sanity fetch: trivial program + D2H must work
    v = jnp.arange(1024, dtype=jnp.uint32).sum()
    log(f"sanity fetch: {int(np.asarray(v))}")

    pk, vk = groth16.load_pk(os.path.join(CACHE, "spend_k18.npz"))
    data = np.load(os.path.join(CACHE, "spend_k18_W.npz"))
    W = jnp.asarray(data["W0"][:B])
    log(f"pk loaded k={pk.k} W={tuple(W.shape)}")

    # 1. h kernel, then fetch the FULL h (268 MB at B=16) — exercises a big
    # D2H after a big program
    h = groth16._h_batch_kernel(pk.k, pk.mats, W)
    jax.block_until_ready(h)
    log("h done")
    hh = np.asarray(h)
    log(f"h fetched ok ({hh.nbytes/1e6:.0f} MB, checksum {int(hh.sum())&0xffffffff})")

    # 2. the a MSM (batched Pippenger G1), then fetch its tiny result
    n_tiles = max(8, 64 // max(1, B))
    a = groth16._msm_batch_kernel("g1", n_tiles, pk.a_query, W)
    jax.block_until_ready(a)
    log("a done")
    ah = [np.asarray(c) for c in a]
    log(f"a fetched ok ({[c.shape for c in ah]})")

    # 3. run the a MSM AGAIN and fetch again (a second execution of the same
    # loaded program)
    a2 = groth16._msm_batch_kernel("g1", n_tiles, pk.a_query, W)
    jax.block_until_ready(a2)
    ah2 = [np.asarray(c) for c in a2]
    eq = all((x == y).all() for x, y in zip(ah, ah2))
    log(f"a rerun fetched ok, deterministic={eq}")
    print("OK fetch-probe complete", flush=True)


if __name__ == "__main__":
    main()
