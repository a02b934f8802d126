"""Inverted-SAD matching cost volume construction.

The reference kernel is named "NCC" but its NCC body is commented out; the
live code computes an inverted-SAD *similarity*
(``csrc/depth/kernels/ncc_matching_cost_volume_construction.cu:67-76`` via
``device_functions.cuh:53-73``):

    cost(x, y, d) = sum_{|i|<=r, |j|<=r} 255 - |L[x+i, y+j] - R[x+i, y+j-d]|

Higher is better.  Border indices wrap (``pad_index``; see
``ops/boxfilter.py`` for the mod-wrap equivalence).

TPU formulation: for each disparity ``d``, the patch sum is a wrap-padded box
filter of the absolute-difference plane ``|L - roll(R, d, axis=cols)|``, so
the whole volume is D elementwise planes + separable running sums — no
O(r^2) inner loops and no gathers; XLA fuses the rolls with the subtraction.
"""

from __future__ import annotations

import jax.numpy as jnp

from .boxfilter import box_sum_2d

MAX_INTENSITY = 255.0


def sad_similarity_plane(left: jnp.ndarray, right: jnp.ndarray,
                         disparity: int, patch_radius: int) -> jnp.ndarray:
    """Inverted-SAD similarity of ``left`` vs ``right`` shifted by a single
    static ``disparity``, for every pixel.  Shapes: (H, W) -> (H, W)."""
    diff = jnp.abs(left - jnp.roll(right, disparity, axis=-1))
    area = (2 * patch_radius + 1) ** 2
    return area * MAX_INTENSITY - box_sum_2d(diff, patch_radius, patch_radius)


def sad_cost_volume(left: jnp.ndarray, right: jnp.ndarray,
                    min_disparity: int, max_disparity: int,
                    patch_radius: int) -> jnp.ndarray:
    """Build the (H, W, D) similarity volume, D = max - min + 1.

    ``volume[..., i]`` holds the cost at disparity ``min_disparity + i``
    (disparities in the input's resolution units).
    """
    num_d = max_disparity - min_disparity + 1
    # (D, H, W) stack of rolled right views; roll(R, d)[y] == R[(y - d) mod W].
    rolled = jnp.stack(
        [jnp.roll(right, min_disparity + i, axis=-1) for i in range(num_d)], axis=0
    )
    diff = jnp.abs(left[None] - rolled)
    area = (2 * patch_radius + 1) ** 2
    cost = area * MAX_INTENSITY - box_sum_2d(diff, patch_radius, patch_radius,
                                             row_axis=-2, col_axis=-1)
    return jnp.moveaxis(cost, 0, -1)
