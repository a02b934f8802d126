"""Experiment: executable-count overhead on the e2e single-view chain.

The split-inference chain is net -> blend tail -> classical matcher (three
dispatches per frame).  Hypothesis: per-dispatch overhead through the
tunnel runtime costs ~0.3-0.6 ms each, so merging the two Pallas-bearing
executables (tail + matcher) into one should recover one dispatch's worth.

Measures, with the dispatch-slope protocol from bench.py:
  chain3 : current production chain (net, tail, match)
  chain2 : net, then ONE jitted (tail -> match) executable
  probe  : chain3 plus one trivial extra dispatch (quantifies marginal
           per-dispatch cost directly)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chained_slope_fps, _enable_compile_cache
from stereo_tpu.core.config import MatchingConfig
from stereo_tpu.matching.classical import compute_disparity_map
from stereo_tpu.synthesis.right_view_synthesis import (RightViewSynthesis,
                                                       fused_blend_tail)


def main() -> None:
    _enable_compile_cache()
    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    rvs = RightViewSynthesis(output_shape=(384, 1280))
    assert rvs.split_inference

    rng = np.random.default_rng(2)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    ld = jax.device_put(jnp.asarray(left))
    variables = jax.device_put(rvs.variables)

    match = jax.jit(lambda l, r: compute_disparity_map(l, r, cfg))
    perturb = jax.jit(lambda i: jnp.clip(ld + i * jnp.float32(1e-3),
                                         0.0, 255.0))

    def chain3(left_dev):
        prob_low, full01 = rvs._fn_net(variables, left_dev[None])
        right = rvs._fn_tail(prob_low, full01)[0]
        return match(left_dev, right)

    import functools
    tail = functools.partial(fused_blend_tail, scale=4,
                             output_shape=(384, 1280),
                             full_shape=(384, 1280))
    merged = jax.jit(lambda prob_low, full01, l:
                     compute_disparity_map(l, tail(prob_low, full01)[0], cfg))

    def chain2(left_dev):
        prob_low, full01 = rvs._fn_net(variables, left_dev[None])
        return merged(prob_low, full01, left_dev)

    bump = jax.jit(lambda d: d + jnp.float32(1.0))

    def chain4(left_dev):
        return bump(chain3(left_dev))

    for name, fn in [("chain3", chain3), ("chain2", chain2),
                     ("chain4_probe", chain4)]:
        for rep in range(3):
            fps = _chained_slope_fps(fn, lambda i: perturb(jnp.float32(i)),
                                     m_small=16, m_large=64)
            print(f"{name}[{rep}]: {fps:.1f} FPS  "
                  f"({1000.0 / fps:.3f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
