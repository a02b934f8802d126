"""Single-view batch weak-scaling bench (refresh of the r4 record).

Measures frames/s of the production fused single-view chain
(``pipeline/single_view.py``: Deep3D RVS net executable + merged Pallas
blend-tail/matcher executable) at growing batch sizes on the one real
chip, with the r5 checkpoint and the r5 streaming soft-argmin head in the
graph.  Protocol is bench.py's dispatch-slope marginal: one outer jit runs
the full two-stage chain M times in-graph over distinct inputs and reduces
to a scalar, and the (M_large - M_small) slope differences out tunnel RPC,
dispatch scheduling, and readback.

Parity scenario: the reference's headline one-left-view-in path
(``/root/reference/src/python/api.py:25-31``), batched.

Usage::

    python scripts/bench_single_view_batch.py \
        --out results/scaling/single_view_batch_tpu.json
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

from stereo_tpu.core.config import MatchingConfig
from stereo_tpu.pipeline.single_view import FusedSingleViewEngine
from stereo_tpu.synthesis.right_view_synthesis import RightViewSynthesis


def measure_batch(engine, batch, repeats=4, m_small=4, m_large=16):
    h, w = engine.config.height, engine.config.width
    rng = np.random.default_rng(batch)
    left = jnp.asarray(rng.uniform(0, 255, (batch, 3, h, w)), jnp.float32)

    def make_runner(m):
        @jax.jit
        def run_m(seed, l):
            def one(i):
                prob_low, full01 = engine._fn_net(
                    engine.synthesis.variables, l + (seed + i) * 1e-38)
                d, r = engine._fn_tail_match(prob_low, full01, l)
                return jnp.sum(d) + jnp.sum(r)
            return jnp.sum(lax.map(one, jnp.arange(m, dtype=jnp.float32)))
        return run_m

    run_small, run_large = make_runner(m_small), make_runner(m_large)
    jax.block_until_ready(run_small(jnp.float32(1.0), left))
    jax.block_until_ready(run_large(jnp.float32(2.0), left))

    def timed(run, seed):
        t0 = time.perf_counter()
        float(run(jnp.float32(seed), left))
        return time.perf_counter() - t0

    seed, t_small, t_large = 3.0, float("inf"), float("inf")
    for _ in range(repeats):
        t_small = min(t_small, timed(run_small, seed))
        t_large = min(t_large, timed(run_large, seed + 1))
        seed += 2
    slope = max((t_large - t_small) / (m_large - m_small), 1e-9)
    return batch / slope, slope / batch * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/scaling/single_view_batch_tpu.json")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    config = MatchingConfig(height=384, width=1280, downscale_factor=2,
                            min_disparity=0, max_disparity=64, threshold=5)
    rvs = RightViewSynthesis(output_shape=(384, 1280))
    engine = FusedSingleViewEngine(config, rvs)

    rows = []
    for b in args.batches:
        fps, ms = measure_batch(engine, b, repeats=args.repeats)
        rows.append({"batch": b, "frames_per_s": round(fps, 1),
                     "ms_per_frame": round(ms, 3)})
        print(f"batch {b}: {fps:.1f} frames/s ({ms:.3f} ms/frame)", flush=True)

    record = {
        "date": time.strftime("%Y-%m-%d"),
        "config": ("single view (Deep3D RVS + classical matcher), 384x1280 "
                   "D=0..64, fp32, one v5e chip, r5 checkpoint + streaming "
                   "soft-argmin head"),
        "protocol": ("dispatch-slope over the production 2-executable chain "
                     "(pipeline/single_view.py), m=4/16 in-graph trips, min "
                     f"of {args.repeats} repeats"),
        "rows": rows,
        "note": ("Refresh of the r4 record on the r5 engine (retrained "
                 "checkpoint, streaming head -- no full-res probability "
                 "volume materializes).  Batching amortizes per-executable "
                 "dispatch overhead and batches the Deep3D convs; the "
                 "matcher runs per-frame inside the merged executable.  "
                 "Serving's micro-batcher (serve/api.py, default depth 8) "
                 "rides this curve."),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"out": args.out, "rows": rows}))


if __name__ == "__main__":
    main()
