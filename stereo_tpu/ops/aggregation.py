"""Multi-block matching (MBM) cost aggregation.

Chang & Maruyama-style aggregation
(``csrc/depth/kernels/multi_block_matching_cost_aggregation.cu:58-88``): for
every (x, y, d) the aggregated score is the *product* of three window sums of
the raw cost slice —

    horizontal line block : rows [-s, s]  x cols [-L, L]
    vertical   line block : rows [-L, L]  x cols [-s, s]
    center     square     : rows [-m, m]  x cols [-m, m]

with wrap-around (``pad_index``) boundary handling.  The CUDA kernel stages a
halo tile in shared memory purely as a bandwidth cache; the math is exactly
windowed box sums, so the TPU-native form is three separable wrap box
filters (cumsum running sums) — an O(1)-per-element algorithm instead of the
reference's O(L^2) loads per thread.
"""

from __future__ import annotations

import jax.numpy as jnp

from .boxfilter import box_sum_2d


def mbm_aggregate(cost_volume: jnp.ndarray, small_radius: int,
                  mid_radius: int, large_radius: int) -> jnp.ndarray:
    """(H, W, D) raw cost -> (H, W, D) aggregated cost (product of 3 box sums)."""
    cv = jnp.moveaxis(cost_volume, -1, 0)  # (D, H, W): filter over trailing axes
    horizontal = box_sum_2d(cv, small_radius, large_radius)
    vertical = box_sum_2d(cv, large_radius, small_radius)
    center = box_sum_2d(cv, mid_radius, mid_radius)
    return jnp.moveaxis(horizontal * vertical * center, 0, -1)
