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


def measure_batch(engine, batch, repeats=4, m_small=8, m_large=24):
    """Async-pipelined dispatch-slope over the production 2-executable chain.

    Wrapping the whole chain in one outer jit is NOT viable here: the
    merged net+tail mega-graph broke the tunnel's remote-compile endpoint
    (observed: 29 min then `Broken pipe` on /remote_compile).  Instead this
    drives the two executables the pipeline actually ships — already in the
    committed bench_cache — the way serving does: enqueue M chains over
    DISTINCT device-resident inputs without blocking (JAX async dispatch
    overlaps the ~25 ms/exec tunnel RPC with device compute), block on all
    M outputs, and take the (M_large - M_small) marginal slope so fixed
    costs difference out.  Distinct inputs defeat the tunnel's
    value-identical memoization; blocking on the real outputs defeats
    elision.
    """
    h, w = engine.config.height, engine.config.width
    rng = np.random.default_rng(batch)
    base = jnp.asarray(rng.uniform(0, 255, (batch, 3, h, w)), jnp.float32)
    perturb = jax.jit(lambda x, e: x + e)
    lefts = [jax.device_put(perturb(base, jnp.float32(i) * 1e-38))
             for i in range(m_large)]
    jax.block_until_ready(lefts)

    # The tunnel's block_until_ready returns before remote compute drains
    # (verified: blocking alone reads 5000+ "FPS" at batch 1), so the timed
    # unit must end in a VALUE readback whose dependency chain covers every
    # chain's outputs: a device scalar accumulated across chains, float()ed
    # once at the end.  All intermediate dispatches stay async.
    acc = jax.jit(lambda s, d, r: s + jnp.sum(d) + jnp.sum(r))

    def run_chain(m, offset):
        s = jnp.float32(0.0)
        for i in range(m):
            d, r = engine.process_batch(lefts[(offset + i) % m_large])
            s = acc(s, d, r)
        return float(s)

    run_chain(2, 0)  # warm (cache-hit compile)

    def timed(m, offset):
        t0 = time.perf_counter()
        run_chain(m, offset)
        return time.perf_counter() - t0

    t_small = t_large = float("inf")
    for r in range(repeats):
        t_small = min(t_small, timed(m_small, r))
        t_large = min(t_large, timed(m_large, r + 1))
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
        "protocol": ("async-pipelined dispatch-slope over the production "
                     "2-executable chain (pipeline/single_view.py), m=8/24 "
                     f"chains over distinct device-resident inputs, min of "
                     f"{args.repeats} repeats"),
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
