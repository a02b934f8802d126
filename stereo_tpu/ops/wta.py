"""Winner-take-all disparity selection.

Per-pixel argmax over the disparity axis of the aggregated similarity volume
(``csrc/depth/kernels/wta_disparity_selection.cu:22-30``).  The reference
scans with strict ``>`` so the *first* maximum wins — ``jnp.argmax`` has the
same first-occurrence tie-breaking.  The result is offset by the downscaled
minimum disparity, i.e. values are in downscaled-resolution units.
"""

from __future__ import annotations

import jax.numpy as jnp


def wta_disparity(aggregated_volume: jnp.ndarray, min_disparity: int) -> jnp.ndarray:
    """(H, W, D) -> (H, W) float disparities = argmax_d + min_disparity."""
    best = jnp.argmax(aggregated_volume, axis=-1)
    return (best + min_disparity).astype(aggregated_volume.dtype)
