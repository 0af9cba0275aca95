"""Probe individual prove_batch stages on the real TPU in isolation.

The r03/r04 bench crash surfaces at the first host fetch, so the faulting
kernel can be ANY of the asynchronously queued stage programs. Run one stage
per process:

    python scripts/probe_stage.py h 16 18        # _h_batch_kernel, B, k
    python scripts/probe_stage.py g1 16 8 156870 # _msm_batch_kernel
    python scripts/probe_stage.py g2 16 8 156870
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pob_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def rand_limbs(rng, shape):
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb

    a = rng.integers(0, 1 << 16, size=shape + (limb.L,), dtype=np.int64)
    a[..., -1] &= 0x3FFF
    return jnp.asarray(a.astype(np.uint32))


def main():
    import numpy as np

    t0 = time.perf_counter()

    def log(msg):
        print(f"[probe +{time.perf_counter()-t0:.1f}s] {msg}", flush=True)

    import jax

    from pob_tpu.prover import groth16

    rng = np.random.default_rng(0)
    stage = sys.argv[1]
    log(f"backend={jax.default_backend()} stage={stage} argv={sys.argv[2:]}")

    if stage == "h":
        B, k = int(sys.argv[2]), int(sys.argv[3])
        from pob_tpu.r1cs.spend_circuit import build_spend_cs

        cs = build_spend_cs()
        mats = groth16._mats_to_device(groth16._indexed_matrices(cs)[:2])
        W = rand_limbs(rng, (B, cs.num_wires))
        log("data ready")
        out = groth16._h_batch_kernel(k, mats, W)
        jax.block_until_ready(out)
        log("compiled+ran")
        t1 = time.perf_counter()
        out = groth16._h_batch_kernel(k, mats, W + 1)
        jax.block_until_ready(out)
        print(f"OK h B={B} k={k} run={time.perf_counter()-t1:.3f}s", flush=True)
    else:
        B, T, m = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        cshape = (m,) if stage == "g1" else (m, 2)
        points = tuple(rand_limbs(rng, cshape) for _ in range(3))
        scalars = rand_limbs(rng, (B, m))
        log("data ready")
        out = groth16._msm_batch_kernel(stage, T, points, scalars)
        jax.block_until_ready(out)
        log("compiled+ran")
        t1 = time.perf_counter()
        out = groth16._msm_batch_kernel(stage, T, points, scalars[:, ::-1])
        jax.block_until_ready(out)
        print(f"OK {stage} B={B} T={T} m={m} run={time.perf_counter()-t1:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
