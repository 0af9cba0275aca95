"""Host-keyed persistent XLA compilation-cache location.

XLA:CPU AOT cache entries embed the compile machine's CPU feature set;
loading an entry produced on a different host triggers cpu_aot_loader.cc
warnings and can SIGILL (observed: a cache shared between two bench hosts
segfaulted jax inside compile/serialize). Keying the directory by the host's
CPU flags makes the cache safe to keep on shared scratch storage."""

from __future__ import annotations

import hashlib
import os


def host_cache_dir(prefix: str = "/tmp/jax_cache_pob") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return prefix + "_" + hashlib.md5(flags.encode()).hexdigest()[:10]


def enable_persistent_cache():
    """Set the jax persistent-cache env knobs (no-op if already set)."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", host_cache_dir())
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def pin_platform():
    """Honor an explicit JAX_PLATFORMS choice even when a plugin
    sitecustomize force-set another default (some TPU plugins do). Call
    after importing jax, before any device use — running a CPU-intended
    script on the chip a concurrent bench is using can crash the worker."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
