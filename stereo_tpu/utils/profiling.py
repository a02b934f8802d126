"""Per-stage timing and profiler hooks.

TPU-native replacement for the reference's ``cuda_perf_clock`` context
manager (``helpers/torch_helpers.py:19-28``): wall time with a
``jax.block_until_ready`` fence instead of ``torch.cuda.synchronize``, plus
a thin wrapper around ``jax.profiler`` trace capture for kernel-level
inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def perf_clock(name: str, log: bool = True,
               sync: Optional[object] = None) -> Iterator[None]:
    """Time a block; if ``sync`` (a pytree of jax arrays) is supplied it is
    block_until_ready'd before the clock stops, so device work is included."""
    start = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        if log:
            print(f"[{name}]: {time.perf_counter() - start:.4f} seconds")


class StageTimer:
    """Accumulating stage timer: records per-stage wall time across frames,
    reports mean/total.  Used by the pipeline when ``log_perf_time`` is on."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return {name: self.totals[name] / self.counts[name]
                for name in self.totals}


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
