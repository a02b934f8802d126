"""Secondary matching: 1-D cost-space optimization with parabola-fit subpixel
refinement (``csrc/depth/kernels/secondary_matching.cu:22-99``).

For each downscaled pixel with MBM winner ``d_mbm`` (downscaled units,
including the min-disparity offset), the reference:

1. scans the *full-resolution* inverted-SAD similarity at center
   ``(k*x, k*y)`` over full-res disparities ``[k*(d_mbm-1), k*(d_mbm+1)]``
   (first maximum wins);
2. if the winner ``d_sad`` is strictly interior, fits 3-point parabolas to
   both the MBM cost (around ``d_mbm``) and the SAD cost (around ``d_sad``)
   via ``quadratic_function_peak`` (``device_functions.cuh:22-46``);
3. combines: if ``delta_mbm`` and ``d_sad + delta_sad - k*d_mbm`` share a
   sign, the SAD subpixel estimate ``/k`` wins, otherwise the two estimates
   are averaged (``secondary_matching.cu:63-70``).

TPU formulation: the per-pixel disparity scan is a *data-dependent* window,
hostile to SIMD.  We instead compute a dense stride-``k``-sampled SAD volume
over every disparity any pixel can request (a static range), then extract
each pixel's 7-tap window with one small gather.  The dense volume is pure
elementwise + separable box-sum work that XLA pipelines well.

Deviations from reference (documented, KITTI-exact):
* The reference indexes the aggregated volume at ``pad_index(d_mbm + j, D)``
  where ``d_mbm`` *includes* the min-disparity offset; for ``min_disparity
  > 0`` (Middlebury) this reads wrong/out-of-bounds entries (UB).  We index
  at ``mod(d_idx + j, D)`` which is identical to the reference whenever
  ``min_disparity_down == 0`` (all KITTI configs) and well-defined otherwise.
* Column indices wrap by ``mod`` (see ``ops/boxfilter.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .boxfilter import box_sum_1d
from .cost_volume import MAX_INTENSITY
from .gather import take_lane, take_window_lanes


def quadratic_function_peak(x1, y1, x2, y2, x3, y3):
    """Vectorized transcription of ``device_functions.cuh:22-46``.

    Returns the parabola vertex through (x1,y1),(x2,y2),(x3,y3) when the
    fitted quadratic opens the right way (``a < 0`` in the reference's
    expression), otherwise the x of the largest y with the reference's exact
    tie-breaking.
    """
    denominator = (x1 - x2) * (x2 - x3) * (x1 - x3)
    fallback = jnp.where(y1 > y2,
                         jnp.where(y1 > y3, x1, x3),
                         jnp.where(y2 > y3, x2, x3))
    a = x3 * (y2 - y1) + x2 * (y1 - y3) + x1 * (y3 - y2)
    b = x1 * x1 * (y2 - y3) + x3 * x3 * (y1 - y2) + x2 * x2 * (y3 - y1)
    vertex = -b / (2.0 * a)
    use_vertex = (denominator != 0) & (a < 0)
    return jnp.where(use_vertex, vertex, fallback)


def _have_same_sign(a, b):
    """``device_functions.cuh:48-51`` — strict product positivity."""
    return (a * b) > 0


def sampled_sad_volume(left: jnp.ndarray, right: jnp.ndarray, k: int,
                       patch_radius: int, d_start: int, num_d: int) -> jnp.ndarray:
    """Dense inverted-SAD similarity at full resolution, sampled at the
    stride-``k`` grid of downscaled pixel centers.

    Returns (ceil(H/k), ceil(W/k), num_d); entry ``t`` is the similarity at
    full-res disparity ``d_start + t``.
    """
    area = (2 * patch_radius + 1) ** 2

    # Unrolled static loop: lax.map would serialize into one launch per
    # plane (launch overhead dominated the whole pipeline); unrolled, XLA
    # fuses the roll/diff/colsum chain across planes.
    #
    # Row axis is reduced FIRST: sampling rows ::k right after the row box
    # shrinks the array k-fold before the (more expensive) lane-axis box
    # sum runs — same taps summed, different (fixed) association order.
    # The Pallas kernel (ops/pallas/kernels.py::_sampled_window_kernel)
    # accumulates in this exact order so the impls stay bit-identical.
    planes = []
    for t in range(num_d):
        diff = jnp.abs(left - jnp.roll(right, d_start + t, axis=-1))
        rows = box_sum_1d(diff, patch_radius, axis=-2)[..., ::k, :]
        cols = box_sum_1d(rows, patch_radius, axis=-1)[..., ::k]
        planes.append(area * MAX_INTENSITY - cols)
    return jnp.stack(planes, axis=-1)


def secondary_matching(left_gray: jnp.ndarray, right_gray: jnp.ndarray,
                       aggregated_volume: jnp.ndarray, disparity: jnp.ndarray,
                       k: int, patch_radius: int, min_disparity_down: int,
                       sampled_sad: jnp.ndarray | None = None) -> jnp.ndarray:
    """Refine the WTA ``disparity`` map (downscaled units) to subpixel.

    ``left_gray``/``right_gray`` are full-resolution grayscale; the SAD scan
    runs at full resolution.  Returns the refined (H_d, W_d) float map in
    downscaled units, matching the reference's in-place update semantics.
    """
    num_dd = aggregated_volume.shape[-1]
    win = 2 * k + 3
    d_mbm = disparity.astype(jnp.int32)
    d_idx = d_mbm - min_disparity_down

    if sampled_sad is None:
        d_start = k * (min_disparity_down - 1) - 1
        num_d = k * (num_dd + 1) + 3
        sampled_sad = sampled_sad_volume(left_gray, right_gray, k,
                                         patch_radius, d_start, num_d)

    # Per-pixel 7-tap window: dense index k*d_idx + s holds the similarity at
    # full-res disparity k*(d_mbm - 1) - 1 + s, s in [0, 2k+2].  Masked
    # select-accumulate — NOT take_along_axis, which gathers per element
    # along lanes (~16 ms/frame at KITTI res before this change).
    window = take_window_lanes(sampled_sad, k * d_idx, win, step=k)

    # MBM parabola neighbours from the aggregated volume (mod-D indexing; see
    # module docstring for the min_disparity > 0 deviation).
    def mbm_cost(j):
        return take_lane(aggregated_volume, jnp.mod(d_idx + j, num_dd))

    return refine_from_window(window, disparity, mbm_cost(-1), mbm_cost(0),
                              mbm_cost(1), k)


def refine_from_window(window: jnp.ndarray, disparity: jnp.ndarray,
                       mbm_prev: jnp.ndarray, mbm_center: jnp.ndarray,
                       mbm_next: jnp.ndarray, k: int) -> jnp.ndarray:
    """Core combine rule given each pixel's dense-SAD ``window`` (the 2k+3
    taps around ``k*(d_mbm-1)-1``) and its three MBM parabola costs.

    Split out so the disparity-sharded engine can assemble the window and
    MBM costs with cross-chip collectives and reuse the identical math
    (``secondary_matching.cu:45-70``).
    """
    # Scan slots 1..2k+1 (disparities k*(d_mbm-1) .. k*(d_mbm+1)); first max.
    scan = window[..., 1:-1]
    d_mbm = disparity.astype(jnp.int32)
    best_slot = jnp.argmax(scan, axis=-1)
    c_sad = take_lane(scan, best_slot)
    d_sad = k * (d_mbm - 1) + best_slot
    interior = (best_slot > 0) & (best_slot < 2 * k)

    # SAD parabola neighbours live at window slots best_slot and best_slot+2.
    y_sad_next = take_lane(window, best_slot + 2)
    y_sad_prev = take_lane(window, best_slot)

    fd = disparity  # float d_mbm (WTA output is integral)
    d_sad_f = d_sad.astype(fd.dtype)
    peak_mbm = quadratic_function_peak(fd, mbm_center,
                                       fd + 1.0, mbm_next,
                                       fd - 1.0, mbm_prev)
    peak_sad = quadratic_function_peak(d_sad_f, c_sad,
                                       d_sad_f + 1.0, y_sad_next,
                                       d_sad_f - 1.0, y_sad_prev)

    delta_mbm = peak_mbm - fd
    sad_subpixel = d_sad_f + (peak_sad - d_sad_f)
    agree = _have_same_sign(delta_mbm, sad_subpixel - k * fd)
    refined = jnp.where(agree, sad_subpixel / k,
                        (fd + delta_mbm + sad_subpixel / k) / 2.0)
    return jnp.where(interior, refined, fd)
