"""Shared persistent-XLA-compile-cache setup.

Remote TPU compiles over the container's tunnel are slow (30 s .. 10+ min
for the big DNN graphs), so every entry point that compiles real graphs
shares one on-disk cache at the repo root; repeat runs then load compiled
executables in milliseconds.  Tests use their own cache (``tests/.jax_cache``,
CPU executables) — pass ``cache_dir`` to override.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_bench_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    the repo-root bench cache).  Best-effort: failures are reported to
    stderr, never raised (a missing cache only costs compile time)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or DEFAULT_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception as exc:  # noqa: BLE001 — cache is best-effort
        print(f"compile cache unavailable: {exc}", file=sys.stderr)
