"""Scaling-efficiency report (SURVEY.md §5.5 / BASELINE north-star metric):
batched ProofOfBurn witness throughput at mesh sizes 1..N, printed as one
JSON document with parallel efficiency relative to the 1-device run.

On real multi-chip hardware run it as-is; on a dev box use the virtual mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py --sizes 1,2,4,8 --batch 16

Data parallelism here is proof-batch parallelism (SURVEY.md §2.10): the
batch axis is sharded over the mesh, no cross-device communication in the
witness path — efficiency below 1.0 measures compiler/runtime overhead, not
algorithmic loss."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(sizes, batch, iters, config_name):
    from pob_tpu.utils.cache import enable_persistent_cache, pin_platform

    enable_persistent_cache()
    import jax

    pin_platform()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pob_tpu.circuits.proof_of_burn import PROD_CONFIG, TEST_CONFIG, pob_forward
    from pob_tpu.dist.mesh import data_mesh
    from pob_tpu.harness.inputs import batch_stack, load_pob_input, widen_pob_input
    from pob_tpu.utils.metrics import MetricsRegistry

    cfg = PROD_CONFIG if config_name == "prod" else TEST_CONFIG
    fix = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "pob_input.json")
    raw = json.load(open(fix))
    if config_name == "prod":
        raw = widen_pob_input(raw, cfg)
    inp = load_pob_input(raw, cfg)

    rows = []
    for nd in sizes:
        if nd > len(jax.devices()):
            print(f"# skipping mesh size {nd}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = data_mesh(nd)
        kwargs = batch_stack([inp] * (batch * nd))
        sharded = {
            k: jax.device_put(
                jnp.asarray(v),
                NamedSharding(mesh, P("data", *([None] * (np.asarray(v).ndim - 1)))),
            )
            for k, v in kwargs.items()
        }
        fn = jax.jit(lambda kw: pob_forward(cfg, **kw))
        reg = MetricsRegistry()
        with reg.stage("compile_warm") as h:
            h["out"] = fn(sharded)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(sharded)
            jax.block_until_ready(out["commitment"])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        rows.append(
            {
                "devices": nd,
                "batch_total": batch * nd,
                "median_s": round(dt, 6),
                "proofs_per_s": round(batch * nd / dt, 3),
                "compile_warm_s": round(reg.stages["compile_warm"].mean_s, 3),
            }
        )
    base = rows[0]["proofs_per_s"] / rows[0]["devices"] if rows else 1.0
    for r in rows:
        r["efficiency"] = round(r["proofs_per_s"] / (r["devices"] * base), 4)
    return {"config": config_name, "rows": rows}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=8, help="proofs per device")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--config", default="test", choices=["test", "prod"])
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    print(json.dumps(run(sizes, args.batch, args.iters, args.config), indent=2))
