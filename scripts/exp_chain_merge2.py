"""Per-executable dispatch-slope rates for the merged single-view chain.

Measures the production 2-executable chain (``pipeline/single_view.py``)
and each executable alone, to locate the remaining per-frame time
(protocol: dispatch slope, fixed tunnel cost cancels)."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chained_slope_fps, _enable_compile_cache
from stereo_tpu.core.config import MatchingConfig
from stereo_tpu.pipeline.single_view import FusedSingleViewEngine
from stereo_tpu.synthesis.right_view_synthesis import RightViewSynthesis


def main() -> None:
    _enable_compile_cache()
    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    rvs = RightViewSynthesis(output_shape=(384, 1280))
    engine = FusedSingleViewEngine(cfg, rvs)
    variables = jax.device_put(rvs.variables)

    rng = np.random.default_rng(2)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    ld = jax.device_put(jnp.asarray(left))
    perturb = jax.jit(lambda i: jnp.clip(ld + i * jnp.float32(1e-3),
                                         0.0, 255.0))

    prob0, full0 = engine._fn_net(variables, ld[None])
    prob0, full0 = jax.device_put(prob0), jax.device_put(full0)
    bump = jax.jit(lambda p, i: p + i * jnp.bfloat16(1e-8)
                   if p.dtype == jnp.bfloat16
                   else p + i * jnp.float32(1e-38))

    def chain(left_dev):
        l = left_dev[None]
        prob_low, full01 = engine._fn_net(variables, l)
        return engine._fn_tail_match(prob_low, full01, l)[0]

    def net_only(left_dev):
        return engine._fn_net(variables, left_dev[None])

    def merged_only(left_dev):
        return engine._fn_tail_match(prob0, full0, left_dev[None])

    for rep in range(2):
        for name, fn in [("chain", chain), ("net_only", net_only),
                         ("merged_only", merged_only)]:
            fps = _chained_slope_fps(fn, lambda i: perturb(jnp.float32(i)),
                                     m_small=16, m_large=64)
            print(f"{name}[{rep}]: {fps:.1f} FPS ({1000.0 / fps:.3f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
