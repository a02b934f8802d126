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

# Persistent compilation cache: the suite is compile-bound (Deep3D/GwcNet
# CPU compiles dominate); repeat runs hit the cache and finish in a
# fraction of the time.  Budget check (measured 2026-08-19, 4-way xdist,
# 4 CPUs): COLD cache ~6:30 for 178 tests (7:46 before the heaviest two
# new tests were trimmed), warm ~4:30 — inside the driver's 8-minute
# budget; keep new model-compile tests behind --runslow or shared session
# fixtures so it stays there.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow tests (the handful of pathological "
             "CPU-compile cases: MSNet2D full compiles, Orbax round trips)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy CPU-compile test, skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="heavy CPU compile; run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
