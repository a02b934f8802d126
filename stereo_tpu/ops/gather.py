"""TPU-friendly per-pixel gathers along the trailing (lane) axis.

``jnp.take_along_axis`` along the minor axis lowers to per-element gathers
on TPU — measured ~16 ms for the secondary-matching window extraction alone
(half the whole pipeline).  These helpers express the same gathers as an
unrolled masked select over the (static, small) set of possible start
positions: each candidate start contributes one vectorized
``where(mask, volume[..., t0:t0+width], acc)`` — no gather instructions,
and only ``D/step`` HLO ops (compile-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp

# Each candidate position adds one select op to the HLO, so cost and compile
# time are O(D/step).  That is the right trade at this pipeline's scales
# (D <= ~100 downscaled planes; Middlebury is 94), but a config with
# thousands of candidate positions would bloat the program quadratically —
# fail loudly instead of silently compiling a monster.  Configs that large
# should use the Pallas streamed kernels (ops/pallas), which are O(1) in D.
_MAX_UNROLLED_POSITIONS = 512


def _check_positions(n: int) -> None:
    if n > _MAX_UNROLLED_POSITIONS:
        raise ValueError(
            f"masked-select gather would unroll {n} positions "
            f"(> {_MAX_UNROLLED_POSITIONS}); use the Pallas path "
            "(impl='pallas') for disparity counts this large")


def take_window_lanes(volume: jnp.ndarray, start: jnp.ndarray, width: int,
                      step: int = 1) -> jnp.ndarray:
    """``out[..., s] = volume[..., start[...] + s]`` for s in [0, width).

    ``volume``: (..., D); ``start``: integer array shaped like
    ``volume.shape[:-1]`` whose values lie in ``range(0, D - width + 1,
    step)`` (positions off that grid yield zeros).
    """
    num = volume.shape[-1]
    _check_positions(max(num - width, 0) // step + 1)
    start = start.astype(jnp.int32)
    out = jnp.zeros(volume.shape[:-1] + (width,), volume.dtype)
    for t0 in range(0, num - width + 1, step):
        out = jnp.where((start == t0)[..., None],
                        volume[..., t0:t0 + width], out)
    return out


def take_lane(volume: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """``out[...] = volume[..., index[...]]`` — width-1, step-1 case."""
    num = volume.shape[-1]
    _check_positions(num)
    index = index.astype(jnp.int32)
    out = jnp.zeros(volume.shape[:-1], volume.dtype)
    for t in range(num):
        out = jnp.where(index == t, volume[..., t], out)
    return out
