"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective logic is exercised without a TPU pod
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).

This image pre-registers an ``axon`` TPU-tunnel PJRT backend from
``sitecustomize`` and forces ``jax_platforms="axon,cpu"`` — every jit would
round-trip a slow network tunnel.  jax is therefore already imported when
this conftest runs; we must override via ``jax.config`` (the env var alone
is ignored) *before* any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
