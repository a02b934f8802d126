"""Disparity upscaling with vertical and horizontal bilateral fills.

Stage 7 (``csrc/depth/kernels/upscale_disparity_vertical_fill.cu:22-51``):
scatter ``k * d`` onto the stride-``k`` full-resolution grid, then fill the
``k - 1`` rows between grid rows: linear interpolation when the two anchor
disparities are within ``threshold`` of each other, otherwise pick the
anchor whose *color* (full-res grayscale) is nearer (bilateral selection).
Reference quirks reproduced/deviated:

* "next" anchor disparity is the row *above* (``x - 1``), i.e. rows between
  ``k*x`` and ``k*(x+1)`` interpolate between ``d[x]`` and ``d[x-1]``
  (``:34``).  Reproduced verbatim.
* "next" color reads row ``(k+1)*x`` — not ``k*(x-1)`` (``:31``) — and runs
  out of bounds for ``(k+1)*x >= H`` (UB).  We reproduce the ``(k+1)*x``
  index and clamp to the last row (clean deviation where the reference is
  undefined).
* Rows ``1..k-1`` (between grid rows 0 and k) are never written by the
  reference — they keep stale persistent-buffer content.  We replicate row
  0's anchor disparity there (deviation: top ``k-1`` rows only).

Stage 8 (``csrc/depth/kernels/horizontal_disparity_fill.cu:22-40``): same
rule along rows for every column between multiples of ``k``; anchors are
columns ``y - y%k`` and ``y - y%k + k``.  The right anchor read is out of
bounds in the last column band (``:27``, UB); we clamp to the last grid
column (deviation: last ``k-1`` columns only).  Columns with ``y % k == 0``
are provably unchanged by both reference branches and stay unchanged here.
"""

from __future__ import annotations

import jax.numpy as jnp


def _select_fill(prev_d, next_d, prev_color, next_color, current_color,
                 i, k, threshold):
    """Shared fill rule: linear interpolation within ``threshold``, else
    nearest-color anchor.  Interpolation is ``prev + i*(next - prev)/k`` in
    the reference's exact evaluation order (multiply before divide)."""
    interp = prev_d + (i * (next_d - prev_d)) / k
    bilateral = jnp.where(
        jnp.abs(current_color - prev_color) <= jnp.abs(current_color - next_color),
        prev_d, next_d)
    return jnp.where(jnp.abs(prev_d - next_d) <= threshold, interp, bilateral)


def upscale_vertical_fill(left_gray: jnp.ndarray, disparity_down: jnp.ndarray,
                          k: int, threshold: float) -> jnp.ndarray:
    """(H, W) grayscale + (H_d, W_d) downscaled disparity -> (H, W_d)
    vertically-filled map holding the values of full-res columns ``k*y``.

    Only stride-``k`` columns are meaningful after this stage; the horizontal
    fill propagates them to every column.
    """
    h = left_gray.shape[-2]
    h_d, w_d = disparity_down.shape[-2:]
    scaled = k * disparity_down                       # (H_d, W_d), full-res units

    prev_d = scaled                                    # anchor at row k*x
    next_d = jnp.concatenate([scaled[:1], scaled[:-1]], axis=0)  # row k*(x-1)

    grid_cols = left_gray[..., ::k][:, :w_d]           # (H, W_d) colors at k*y
    kx = jnp.arange(h_d) * k
    prev_color = grid_cols[kx]                         # L[k*x, k*y]
    next_rows = jnp.minimum((k + 1) * jnp.arange(h_d), h - 1)
    next_color = grid_cols[next_rows]                  # L[(k+1)*x, k*y], clamped

    rows = [scaled]                                    # i = 0: the anchor row
    for i in range(1, k):
        current_color = grid_cols[jnp.minimum(kx + i, h - 1)]
        fill = _select_fill(prev_d, next_d, prev_color, next_color,
                            current_color, float(i), float(k), threshold)
        # Row block 0 has no row above: replicate the anchor (deviation).
        fill = fill.at[0].set(scaled[0])
        rows.append(fill)

    # Interleave: output row k*x + i = rows[i][x]; crop to H.
    stacked = jnp.stack(rows, axis=1).reshape(h_d * k, w_d)
    return stacked[:h]


def horizontal_fill(left_gray: jnp.ndarray, vfilled: jnp.ndarray,
                    k: int, threshold: float) -> jnp.ndarray:
    """(H, W) grayscale + (H, W_d) vertically-filled columns -> (H, W) final
    disparity map."""
    h, w = left_gray.shape[-2:]
    w_d = vfilled.shape[-1]

    cols = []
    last = w_d - 1
    for m in range(k):
        prev_d = vfilled                                       # column k*c
        next_d = jnp.concatenate([vfilled[:, 1:], vfilled[:, last:last + 1]],
                                 axis=1)                       # column k*(c+1), clamped
        if m == 0:
            cols.append(prev_d)
            continue
        grid = jnp.arange(w_d) * k
        prev_color = left_gray[:, ::k][:, :w_d]
        next_cols = jnp.minimum(grid + k, w - 1)
        next_color = left_gray[:, next_cols]
        current_color = left_gray[:, jnp.minimum(grid + m, w - 1)]
        cols.append(_select_fill(prev_d, next_d, prev_color, next_color,
                                 current_color, float(m), float(k), threshold))

    stacked = jnp.stack(cols, axis=-1).reshape(h, w_d * k)
    return stacked[:, :w]
