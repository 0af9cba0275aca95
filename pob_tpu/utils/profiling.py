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
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return BenchResult(name, dt, iters, items_per_iter)
