"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective logic is exercised without a TPU pod
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).

Must set the environment before anything imports jax.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
