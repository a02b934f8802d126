"""Pallas-backed classical pipeline (``MatchingConfig(impl="pallas")``).

Stages 2-8 with the hot middle (cost volume, aggregation, WTA, dense SAD +
window extraction) in the two fused Pallas kernels of
:mod:`stereo_tpu.ops.pallas.kernels`; grayscale/mean-pool and the cheap
elementwise tail (parabola refinement, fills) stay in XLA, which fuses them
fine.  Output matches the ``impl="xla"`` path exactly at the interpret-mode
test shapes (tests/test_pallas.py); at full 1080p scale the kernels' fixed
but different float-accumulation order flips near-tie WTA argmaxes on ~0.6%
of pixels (measured: 99.4% of pixels within 0.5 px, mean |d| 0.034 px vs
the CPU XLA golden — tests/test_golden_demo.py documents the numbers).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.config import MatchingConfig
from ... import ops
from ..refinement import refine_from_window
from .kernels import matching_core, sampled_window


def compute_disparity_from_grayscale(left_gray: jnp.ndarray,
                                     right_gray: jnp.ndarray,
                                     config: MatchingConfig) -> jnp.ndarray:
    c = config
    if c.height % c.k or c.width % c.k:
        raise ValueError("pallas impl requires dimensions divisible by the "
                         "downscale factor")
    left_down = ops.mean_pool(left_gray, c.k)
    right_down = ops.mean_pool(right_gray, c.k)

    disparity_down, mbm = matching_core(left_down, right_down, c)
    window = sampled_window(left_gray, right_gray, disparity_down, c)

    refined = refine_from_window(jnp.moveaxis(window, 0, -1), disparity_down,
                                 mbm[0], mbm[1], mbm[2], c.k)
    vfilled = ops.upscale_vertical_fill(left_gray, refined, c.k,
                                        float(c.threshold))
    return ops.horizontal_fill(left_gray, vfilled, c.k, float(c.threshold))
