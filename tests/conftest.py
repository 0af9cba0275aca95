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
