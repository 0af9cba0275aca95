"""Per-kernel throughput report vs chip peak (SURVEY.md §5.1).

Measures the framework's hot device kernels — Montgomery field mul, batched
Keccak-f[1600], batched Poseidon, NTT butterflies, Jacobian point add — and
reports achieved op rates next to a speed-of-light estimate for the backend.

The roofline model: every kernel here is integer-ALU bound on TPU (u32
multiply-accumulate on the VPU plus the 16x16 limb-product matmul on the MXU
for mont_mul). The "peak" numbers are rough per-chip ceilings used for a
utilization *order-of-magnitude*, not a calibrated bound:

  mont_mul   ~ 850 u32-ops per 256-bit modular mul (limb conv + reduce)
  keccak-f   ~ 4600 u32 bitwise ops per permutation (24 rounds x ~190)
  point add  ~ 16 mont_mul + ~10 add/sub

Run on the TPU backend for real numbers; on CPU it still prints (slow).

    python scripts/kernel_roofline.py --out ROOFLINE.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(batch_log2: int = 16, iters: int = 10):
    from pob_tpu.utils.cache import enable_persistent_cache, pin_platform

    enable_persistent_cache()
    import jax

    pin_platform()
    import jax.numpy as jnp
    import numpy as np

    from pob_tpu.field import limb
    from pob_tpu.field.limb import FR
    from pob_tpu.field.ref import FR_MOD, G1_GEN, g1_mul
    from pob_tpu.hash import keccak as kdev
    from pob_tpu.hash.poseidon import poseidon_limbs
    from pob_tpu.prover import curve, ntt
    from pob_tpu.utils.profiling import bench_fn

    n = 1 << batch_log2
    rng = np.random.default_rng(7)
    backend = jax.default_backend()

    def rand_fr(m):
        vals = rng.integers(0, 1 << 62, size=(m, 4)).astype(object)
        ints = [int(a) | int(b) << 62 | int(c) << 124 | int(d) << 186
                for a, b, c, d in vals]
        return jnp.asarray(limb.ints_to_limbs([v % FR_MOD for v in ints]))

    results = []

    # 1. mont_mul: n lanes of 256-bit modular multiply
    a = limb.to_mont(FR, rand_fr(n))
    b = limb.to_mont(FR, rand_fr(n))
    f = jax.jit(lambda x, y: limb.mont_mul(FR, x, y))
    r = bench_fn("mont_mul", f, a, b, iters=iters, items_per_iter=n)
    results.append(("mont_mul", r, 850))

    # 1b. the hand-written Pallas twin (field/pallas_mont.py) — TPU only;
    # on CPU the kernel runs in interpreter mode (correctness, not speed)
    if backend == "tpu":
        from pob_tpu.field.pallas_mont import mont_mul_pallas

        fp = jax.jit(lambda x, y: mont_mul_pallas(FR, x, y))
        r = bench_fn("mont_mul_pallas", fp, a, b, iters=iters, items_per_iter=n)
        results.append(("mont_mul_pallas", r, 850))

    # 2. keccak-f[1600]: batched permutations (bitsliced u32-pair lanes)
    m = n // 16
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(m, 25), dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(m, 25), dtype=np.uint64).astype(np.uint32))
    kf = jax.jit(kdev.keccak_f)
    r = bench_fn("keccak_f", kf, lo, hi, iters=iters, items_per_iter=m)
    results.append(("keccak_f", r, 4600))

    # 3. poseidon(3): batched hashes
    m = n // 16
    inp = rand_fr(3 * m).reshape(m, 3, limb.L)
    pf = jax.jit(poseidon_limbs)
    r = bench_fn("poseidon3", pf, inp, iters=iters, items_per_iter=m)
    results.append(("poseidon3", r, 65 * 850 * 4))  # ~65 rounds x t mont ops

    # 4. NTT 2^18 (batched Montgomery butterflies)
    k = 18
    coeffs = limb.to_mont(FR, rand_fr(1 << k))
    nf = jax.jit(lambda x: ntt.ntt(x, k))
    r = bench_fn("ntt_2^18", nf, coeffs, iters=max(3, iters // 3),
                 items_per_iter=(1 << k) * k // 2)  # butterflies
    results.append(("ntt_2^18_butterfly", r, 3 * 850))

    # 5. Jacobian G1 point add: n/4 lanes
    m = n // 4
    pts = curve.g1_points_to_device([g1_mul(G1_GEN, i + 1) for i in range(64)])
    reps = tuple(jnp.tile(c, (m // 64,) + (1,) * (c.ndim - 1)) for c in pts)
    pa = jax.jit(lambda p: curve.point_add(curve.FqOps, p, p))
    r = bench_fn("g1_add", pa, reps, iters=iters, items_per_iter=m)
    results.append(("g1_add", r, 16 * 850))

    # 6. indexed-memory primitives — the ops that decide MSM architecture.
    # XLA:TPU serializes scatter updates (~1-2us/index measured r05, the
    # reason Pippenger bucket accumulation is latency-bound and the planned
    # bitsum path exists); gather and sort are the building blocks of the
    # alternative sort-based MSM. Reported as rows/s (row = 16 x u32).
    mi = n
    rows = jnp.asarray(rng.integers(0, 1 << 16, size=(mi, 16), dtype=np.int64)
                       .astype(np.uint32))
    idx = jnp.asarray(rng.permutation(mi).astype(np.int32))
    gf = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    r = bench_fn("gather_rows", gf, rows, idx, iters=iters, items_per_iter=mi)
    results.append(("gather_rows", r, 16))
    sf = jax.jit(lambda x, i, v: x.at[i].set(v))
    r = bench_fn("scatter_rows", sf, rows, idx, rows, iters=iters,
                 items_per_iter=mi)
    results.append(("scatter_rows", r, 16))
    af = jax.jit(lambda i: jnp.argsort(i))
    r = bench_fn("argsort_u32", af, idx, iters=iters, items_per_iter=mi)
    results.append(("argsort_u32", r, 32))

    # chip integer peak estimate (u32 ops/s): v5p VPU ~ 4 int ops/cycle/lane
    # x 8 cores... use a coarse 2e14 for TPU, 5e10 for one CPU core
    peak_u32 = 2e14 if backend != "cpu" else 5e10

    rows = []
    for name, r, ops_per_item in results:
        u32_rate = r.items_per_sec * ops_per_item
        rows.append(
            {
                "kernel": name,
                "items_per_s": round(r.items_per_sec, 1),
                "ms_per_iter": round(r.seconds_per_iter * 1e3, 3),
                "est_u32_ops_per_item": ops_per_item,
                "est_u32_ops_per_s": f"{u32_rate:.3e}",
                "est_utilization_vs_peak": round(u32_rate / peak_u32, 4),
            }
        )
    return {"backend": backend, "batch_log2": batch_log2,
            "peak_u32_ops_per_s": f"{peak_u32:.1e}", "kernels": rows}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-log2", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out")
    args = ap.parse_args()
    rep = run(args.batch_log2, args.iters)
    text = json.dumps(rep, indent=2)
    print(text)
    if args.out:
        open(args.out, "w").write(text + "\n")
