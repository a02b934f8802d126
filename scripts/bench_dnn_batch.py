"""Re-test of the r4 "conv-dim batching hurts DNN backends" negative under
the r5 streaming soft-argmin head.

The r4 record (``results/scaling/dnn_batch_tpu.json``, commit 564a28d)
predates the streaming head (833d05d): its executables materialized the
full-resolution probability volume (126 MB/frame at D=64, 377 MB at D=192)
PER BATCH ELEMENT, which by itself explains collapsing throughput at
batch 4.  With the streaming head that volume never exists, so the negative
needs re-measurement before r6 trusts it.

Protocol matches the prior record: in-graph ``lax.map`` over seeded
batches, conv batch dim varied, dispatch-slope marginal between two trip
counts (differences out tunnel RPC/dispatch).

Parity scenario: the DNN matching backends the reference benchmarks
(``/root/reference/README.md:51``).

Usage::

    python scripts/bench_dnn_batch.py --out results/scaling/dnn_batch_tpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend


def batch_fps(backend, params, batch, m_small, m_large, repeats=3):
    rng = np.random.default_rng(batch)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (batch, 3, 384, 1280)), jnp.float32))

    def make_runner(m):
        @jax.jit
        def run_m(seed, l, p):
            def one(i):
                eps = (seed + i) * 1e-38
                return jnp.sum(backend._forward(p, l + eps, l))
            return jnp.sum(lax.map(one, jnp.arange(m, dtype=jnp.float32)))
        return run_m

    run_small, run_large = make_runner(m_small), make_runner(m_large)
    jax.block_until_ready(run_small(jnp.float32(1.0), x, params))
    jax.block_until_ready(run_large(jnp.float32(2.0), x, params))

    def timed(run, seed):
        t0 = time.perf_counter()
        float(run(jnp.float32(seed), x, params))
        return time.perf_counter() - t0

    seed, t_s, t_l = 3.0, float("inf"), float("inf")
    for _ in range(repeats):
        t_s = min(t_s, timed(run_small, seed))
        t_l = min(t_l, timed(run_large, seed + 1))
        seed += 2
    slope = max((t_l - t_s) / (m_large - m_small), 1e-9)
    return batch / slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/scaling/dnn_batch_tpu.json")
    ap.add_argument("--jobs", nargs="*", default=[
        "msnet2d:float32:1,2,4", "gwcnet:bfloat16:1,2,4"])
    args = ap.parse_args()

    fps = {}
    for job in args.jobs:
        name, dtype, batches = job.split(":")
        max_d = 64 if name == "msnet2d" else 192
        backend = DnnStereoMatchingBackend(name, image_shape=(384, 1280),
                                           max_disparity=max_d,
                                           compute_dtype=dtype)
        params = jax.device_put(backend.params)
        # trip counts scaled so m_large*batch covers >= ~0.8 s of device
        # time for the slow D=192 nets without exploding compile time
        m_s, m_l = (4, 12) if name == "msnet2d" else (2, 6)
        for b in (int(x) for x in batches.split(",")):
            key = f"{name}_{dtype}_batch{b}"
            fps[key] = round(batch_fps(backend, params, b, m_s, m_l), 2)
            print("ROW", key, fps[key], flush=True)
        del backend, params

    record = {
        "date": time.strftime("%Y-%m-%d"),
        "config": "384x1280, one v5e chip, r5 streaming soft-argmin head",
        "protocol": ("in-graph lax.map over seeded batches; conv batch dim; "
                     "dispatch-slope marginal between two trip counts"),
        "frames_per_s": fps,
        "note": ("Re-measurement of the r4 negative (564a28d) under the "
                 "streaming head (833d05d): the r4 executables materialized "
                 "the 126-377 MB/frame full-res probability volume per batch "
                 "element, which the streaming head eliminates.  See the "
                 "verdict field for whether conv-dim batching now pays."),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(fps))


if __name__ == "__main__":
    main()
