"""Timing / throughput harness (SURVEY.md §5.1: the reference has no
profiling; the framework treats per-kernel throughput as a first-class
metric)."""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax


@dataclass
class BenchResult:
    name: str
    seconds_per_iter: float
    iters: int
    items_per_iter: int = 1

    @property
    def items_per_sec(self) -> float:
        return self.items_per_iter / self.seconds_per_iter

    def __str__(self):
        return (
            f"{self.name}: {self.seconds_per_iter*1e3:.3f} ms/iter, "
            f"{self.items_per_sec:,.1f} items/s"
        )


def bench_fn(name, fn, *args, iters: int = 10, items_per_iter: int = 1,
             warmup: int = 1, **kw) -> BenchResult:
    """Time a jitted function with proper device synchronization."""
    import numpy as np

    def sync(o):
        # block_until_ready has been observed NOT to block on tunneled TPU
        # backends (r05: worker kills and timings hid behind it) — a D2H
        # fetch is the reliable barrier. Fetch ONE element (the slice
        # depends on the whole result being materialized) so the barrier
        # costs a tunnel RTT, not a full-tensor transfer; the RTT is
        # amortized over iters.
        jax.block_until_ready(o)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    for _ in range(warmup):
        out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return BenchResult(name, dt, iters, items_per_iter)
