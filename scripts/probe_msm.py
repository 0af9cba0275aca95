"""Probe: batched Pippenger MSM memory/crash envelope on the real TPU.

BENCH_r03 died with a TPU worker kernel fault inside
_msm_batch_kernel("g2", n_tiles=8, ...) at B=16, m=156870
(pob_tpu/prover/groth16.py:499). This probe sweeps (group, B, n_tiles)
configurations with synthetic (valid-shape, not-on-curve) points so each
config's compile+run either completes or faults in isolation; run one config
per process so a fault doesn't poison the rest:

    python scripts/probe_msm.py g2 16 8 156870
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(group: str, B: int, n_tiles: int, m: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb
    from pob_tpu.prover import groth16

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)

    def rand_limbs(shape):
        # < 2^255ish random limbs; fine for perf/crash probing (formulas are
        # branchless and do not require on-curve inputs)
        a = rng.integers(0, 1 << 16, size=shape + (limb.L,), dtype=np.int64)
        a[..., -1] &= 0x3FFF
        return jnp.asarray(a.astype(np.uint32))

    cshape = (m,) if group == "g1" else (m, 2)
    points = (rand_limbs(cshape), rand_limbs(cshape), rand_limbs(cshape))
    scalars = rand_limbs((B, m))
    print(f"[probe +{time.perf_counter()-t0:.1f}s] data ready "
          f"{group} B={B} T={n_tiles} m={m}", flush=True)

    out = groth16._msm_batch_kernel(group, n_tiles, points, scalars)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    print(f"[probe +{t_compile:.1f}s] compiled+ran once", flush=True)
    # a worker kill can hide behind a successful block_until_ready (r05
    # fetch-probe evidence); the D2H fetch is the real health check
    host = [np.asarray(c) for c in out]
    print(f"[probe +{time.perf_counter()-t0:.1f}s] fetched ok "
          f"(checksum {sum(int(c.sum()) for c in host) & 0xffffffff})",
          flush=True)

    t1 = time.perf_counter()
    out = groth16._msm_batch_kernel(group, n_tiles, points, scalars)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t1
    [np.asarray(c) for c in out]
    print(f"OK {group} B={B} T={n_tiles} m={m} run={dt:.3f}s "
          f"({B/dt:.2f} msm/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
