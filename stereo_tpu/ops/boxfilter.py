"""Wrap-padded separable box sums.

The reference's CUDA kernels evaluate window sums with naive per-thread loops
over (2r+1)^2 taps, using ``pad_index`` wrap-around indexing at borders
(``csrc/depth/kernels/device_functions.cuh:10-20``).  On TPU the idiomatic
form is a *separable running-sum* box filter: wrap-pad, one cumulative sum and
one subtraction per axis.  Same result, O(1) work per element instead of
O(r^2).

``pad_index`` semantics: identity inside ``[0, dim)``; ``dim + i`` for
``i < 0``; ``0`` for ``i == dim``.  All of these coincide with ``i mod dim``.
For ``i > dim`` the reference computes ``dim - i`` (negative) and performs an
out-of-bounds read — undefined behaviour that never triggers for its shipped
configurations; we use ``mod`` everywhere (documented clean deviation).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def wrap_pad(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Circularly pad ``x`` by ``radius`` on both sides of ``axis``."""
    if radius == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    return jnp.pad(x, pad, mode="wrap")


# Window width above which the cumsum (running-sum) formulation wins over
# direct shifted-slice accumulation.  On TPU, prefix sums along the minor
# (lane) axis lower poorly, while 2r+1 shifted adds fuse into one VPU loop —
# so the direct form is faster for every radius the reference ships (<= 10).
_DIRECT_MAX_WINDOW = 32


def box_sum_1d(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Windowed sum over ``[i-radius, i+radius]`` along ``axis`` with
    wrap-around boundary handling. Output shape == input shape."""
    if radius == 0:
        return x
    xp = wrap_pad(x, radius, axis)
    n = x.shape[axis]
    w = 2 * radius + 1
    if w <= _DIRECT_MAX_WINDOW:
        acc = lax.slice_in_dim(xp, 0, n, axis=axis)
        for i in range(1, w):
            acc = acc + lax.slice_in_dim(xp, i, i + n, axis=axis)
        return acc
    c = jnp.cumsum(xp, axis=axis, dtype=x.dtype)
    # window_sum[i] = c[i + w - 1] - c[i - 1]; realize c[-1] = 0 via shifted slices.
    hi = lax.slice_in_dim(c, w - 1, w - 1 + n, axis=axis)
    lo = lax.slice_in_dim(c, 0, n - 1, axis=axis)
    first = lax.slice_in_dim(hi, 0, 1, axis=axis)
    rest = lax.slice_in_dim(hi, 1, n, axis=axis) - lo
    return jnp.concatenate([first, rest], axis=axis)


def box_sum_2d(x: jnp.ndarray, radius_rows: int, radius_cols: int,
               row_axis: int = -2, col_axis: int = -1) -> jnp.ndarray:
    """Separable 2-D wrap box sum over a (2*rr+1) x (2*rc+1) window."""
    return box_sum_1d(box_sum_1d(x, radius_cols, col_axis), radius_rows, row_axis)
