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
    """Key on CPU flags + model name + jax version: two VM hosts were
    observed with identical cpuinfo *flags* but different XLA target tuning
    (one compiled CPU AOT entries with +prefer-no-scatter/+prefer-no-gather
    the other's loader rejects), so flags alone under-keyed the cache."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    parts.append(line)
                    if len(parts) == 2:
                        break
    except OSError:
        pass
    try:
        from importlib.metadata import version

        parts.append(version("jax"))
    except Exception:
        pass
    key = hashlib.md5("".join(parts).encode()).hexdigest()[:10]
    path = prefix + "_" + key
    # one-time migration from the older flags-only key: same-host entries
    # are valid there and re-compiling them (TPU setup programs run to
    # minutes) is the only cost of a fresh dir
    if not os.path.isdir(path):
        legacy = _legacy_cache_dir(prefix)
        if legacy != path and os.path.isdir(legacy):
            import shutil

            try:
                shutil.copytree(legacy, path)
            except OSError:
                pass
    return path


def _legacy_cache_dir(prefix: str) -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return prefix + "_" + hashlib.md5(flags.encode()).hexdigest()[:10]


def enable_persistent_cache():
    """Enable the jax persistent compilation cache.

    Env vars alone are NOT enough here: jax's config defaults latch the
    environment when the config module is imported, and a plugin
    sitecustomize (e.g. the axon TPU plugin's) imports jax before any user
    code runs — so for four rounds the env-only version silently wrote
    nothing (the cache dir stayed empty while every process recompiled
    cold). Set the env (inherited by subprocesses that might import jax
    pre-sitecustomize) AND the live config values."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", host_cache_dir())
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes",
        int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
    )


def pin_platform():
    """Honor an explicit JAX_PLATFORMS choice even when a plugin
    sitecustomize force-set another default (some TPU plugins do). Call
    after importing jax, before any device use — running a CPU-intended
    script on the chip a concurrent bench is using can crash the worker.

    The config update is silently ineffective once backends are initialized
    (e.g. a harness touched jax.devices() before calling us), so that case
    gets a loud warning instead of a silent mis-pin."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            from jax._src import xla_bridge

            initialized = xla_bridge.backends_are_initialized()
        except Exception:
            initialized = False
        if initialized:
            import warnings

            current = jax.default_backend()
            want = os.environ["JAX_PLATFORMS"].split(",")[0]
            if current != want and not (want == "axon" and current == "tpu"):
                warnings.warn(
                    f"pin_platform: JAX backends already initialized "
                    f"(default={current!r}); JAX_PLATFORMS="
                    f"{os.environ['JAX_PLATFORMS']!r} cannot take effect",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
