"""Run ALL prove_batch stage kernels in one process with everything resident,
mimicking the real prove_batch memory profile (h + a/b1/b2 MSMs at m=nw,
l at m=nw-2, c_h at m=2^k) to isolate the r03/r04 worker crash.

    python scripts/probe_all_stages.py 16 18 156870
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pob_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    import numpy as np

    t0 = time.perf_counter()

    def log(msg):
        print(f"[probe +{time.perf_counter()-t0:.1f}s] {msg}", flush=True)

    import jax

    from pob_tpu.prover import groth16
    from scripts.probe_stage import rand_limbs

    B, k, m = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    n = 1 << k
    rng = np.random.default_rng(0)

    from pob_tpu.r1cs.spend_circuit import build_spend_cs

    cs = build_spend_cs()
    mats = groth16._mats_to_device(groth16._indexed_matrices(cs)[:2])
    W = rand_limbs(rng, (B, m))
    pts_g1 = tuple(rand_limbs(rng, (m,)) for _ in range(3))
    pts_g2 = tuple(rand_limbs(rng, (m, 2)) for _ in range(3))
    pts_l = tuple(rand_limbs(rng, (m - 2,)) for _ in range(3))
    pts_h = tuple(rand_limbs(rng, (n,)) for _ in range(3))
    log(f"data ready B={B} k={k} m={m}")

    n_tiles = max(8, 64 // max(1, B))
    h = groth16._h_batch_kernel(k, mats, W[:, : cs.num_wires])
    log("h dispatched")
    a = groth16._msm_batch_kernel("g1", n_tiles, pts_g1, W)
    log("a dispatched")
    b1 = groth16._msm_batch_kernel("g1", n_tiles, pts_g1, W)
    log("b1 dispatched")
    b2 = groth16._msm_batched("g2", pts_g2, W)
    log("b2 dispatched")
    cl = groth16._msm_batch_kernel("g1", n_tiles, pts_l, W[:, 2:])
    log("cl dispatched")
    ch = groth16._msm_batch_kernel("g1", n_tiles, pts_h, h)
    log("ch dispatched")
    for name, out in (("h", h), ("a", a), ("b1", b1), ("b2", b2), ("cl", cl),
                      ("ch", ch)):
        jax.block_until_ready(out)
        log(f"{name} done")
    t1 = time.perf_counter()
    h = groth16._h_batch_kernel(k, mats, W[:, : cs.num_wires] + 1)
    a = groth16._msm_batch_kernel("g1", n_tiles, pts_g1, W[:, ::-1])
    b1 = groth16._msm_batch_kernel("g1", n_tiles, pts_g1, W[:, ::-1])
    b2 = groth16._msm_batched("g2", pts_g2, W[:, ::-1])
    cl = groth16._msm_batch_kernel("g1", n_tiles, pts_l, W[:, 2:][:, ::-1])
    ch = groth16._msm_batch_kernel("g1", n_tiles, pts_h, h)
    jax.block_until_ready((h, a, b1, b2, cl, ch))
    dt = time.perf_counter() - t1
    print(f"OK all-stages B={B} k={k} m={m} run={dt:.3f}s "
          f"({B/dt:.2f} proofs/s equiv)", flush=True)


if __name__ == "__main__":
    main()
