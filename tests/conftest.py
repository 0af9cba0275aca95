"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; tests exercise the identical jitted
code paths (and the multi-chip sharding logic) on the CPU backend, per
SURVEY.md §4.5.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compilation cache: the mont-arithmetic graphs dominate suite
# runtime via XLA compile time on the 2-core CI host; cache across runs.
# The dir is HOST-KEYED: XLA:CPU AOT results embed the compile machine's CPU
# features and loading an entry produced on a different host SIGILLs (we hit
# exactly this with a cache shared across bench hosts — cpu_aot_loader.cc
# warns, then jax segfaults in compile/serialize).


def _host_cache_dir() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return "/tmp/jax_cache_pob_" + hashlib.md5(flags.encode()).hexdigest()[:10]


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _host_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin's sitecustomize force-sets jax_platforms AND imports
# jax before this file runs, which latches jax's env-derived config
# defaults — so the cache env vars above are inert by themselves (this is
# why four rounds of suites ran compile-cold). Re-pin the platform and the
# cache settings on the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
