"""Failure detection for pod serving (SURVEY.md §5: out of reference scope,
added for the multi-host deployment path).

The reference's only "failure handling" is TORCH_CHECK aborts; a pod-slice
serving deployment needs (a) a cheap per-host device liveness probe and
(b) a supervised execution wrapper that re-initializes the runtime after a
chip/ICI failure instead of wedging the serving loop.
"""

from __future__ import annotations

import concurrent.futures
import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclass
class HealthReport:
    healthy: bool
    latency_s: float
    num_devices: int
    detail: str = ""


def check_devices(timeout_s: float = 30.0,
                  devices: Optional[Sequence] = None) -> HealthReport:
    """Run a tiny computation on every local device with a deadline.

    A hung ICI link or dead chip shows up as a timeout rather than an
    exception, so the probe runs under an executor with a hard deadline.
    """
    devices = list(devices if devices is not None else jax.local_devices())

    def probe():
        outs = []
        for d in devices:
            x = jax.device_put(jnp.ones((8, 128), jnp.float32), d)
            outs.append(jnp.sum(x * 2.0))
        return [float(o) for o in outs]

    start = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(probe)
        try:
            values = fut.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            return HealthReport(False, time.perf_counter() - start,
                                len(devices), "device probe timed out")
        except Exception as exc:  # noqa: BLE001 — any device error = unhealthy
            return HealthReport(False, time.perf_counter() - start,
                                len(devices), f"probe failed: {exc}")
    ok = all(v == 8 * 128 * 2.0 for v in values)
    return HealthReport(ok, time.perf_counter() - start, len(devices),
                        "" if ok else f"bad probe values: {values}")


class SupervisedRunner:
    """Retry wrapper for a step function: on failure, run recovery hooks
    (e.g. ``jax.distributed.shutdown`` + ``initialize``) and retry."""

    def __init__(self, recover: Optional[Callable[[], None]] = None,
                 max_retries: int = 2, backoff_s: float = 1.0):
        self.recover = recover
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.failures = 0

    def run(self, step: Callable, *args, **kwargs):
        attempt = 0
        while True:
            try:
                return step(*args, **kwargs)
            except Exception:
                self.failures += 1
                attempt += 1
                if attempt > self.max_retries:
                    raise
                time.sleep(self.backoff_s * attempt)
                if self.recover is not None:
                    self.recover()
