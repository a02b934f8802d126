"""Disparity shift stack — the building block for DNN cost volumes.

Equivalent of ``cuda_nn_ops.disparity_shift_stack``
(``csrc/nnops/kernels/disparity_shift_stack.cu:22-76``): from a batch of
left views build the stack of horizontally shifted copies,

    out[n, d, c, x, y] = left[n, c, x, y + d]   for  y + d < W, else 0,

for d in [min_disparity, max_disparity].  Also provides the Deep3D-style
shift (``deep3d.py:169-183``), where copy ``d`` is the view shifted *left*
by ``d`` (zero-filled on the right), and the fused "shift + weight + sum"
used by the view-synthesis head so the (N, D, C, H, W) stack never
materializes in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift_cols(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift the trailing (column) axis by ``d`` with zero fill.

    ``d > 0``: ``out[..., y] = x[..., y + d]`` (content moves left).
    ``d < 0``: ``out[..., y] = x[..., y + d]`` for valid ``y + d`` (moves right).
    """
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if d > 0:
        return jnp.pad(x[..., d:], pad + [(0, d)])
    return jnp.pad(x[..., :d], pad + [(-d, 0)])


def disparity_shift_stack(left_nchw: jnp.ndarray, min_disparity: int,
                          max_disparity: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, D, C, H, W) stack of left-shifted views."""
    shifts = [_shift_cols(left_nchw, d)
              for d in range(min_disparity, max_disparity + 1)]
    return jnp.stack(shifts, axis=1)


def weighted_shift_sum(weights_ndhw: jnp.ndarray, view_nchw: jnp.ndarray) -> jnp.ndarray:
    """Deep3D view synthesis (``deep3d.py:162-183``): sum over d of
    ``weights[:, d] * left_shift(view, d)`` without materializing the stack.

    Disparity moves content *left* when synthesizing the right view from the
    left (reference ``deep3d.py:177-180``: ``shifted[..., :-d] =
    view[..., d:]``).

    ``weights``: (N, D, H, W) softmax disparity probabilities.
    ``view``:    (N, C, H, W).  Returns (N, C, H, W).
    """
    num_d = weights_ndhw.shape[1]
    out = jnp.zeros_like(view_nchw)
    for d in range(num_d):
        out = out + weights_ndhw[:, d][:, None] * _shift_cols(view_nchw, d)
    return out
