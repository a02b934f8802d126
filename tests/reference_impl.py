"""Slow, loop-based NumPy oracle for the classical pipeline stages.

Each function is a direct transcription of the semantics of the reference
CUDA kernels (cited per function), written independently in NumPy with
float32 accumulation in the reference's loop order.  These are the golden
implementations the vectorized JAX/Pallas ops are tested against.

Where the reference has undefined behaviour (out-of-bounds reads), the
oracle implements the framework's *documented* semantics (see the ops module
docstrings) so it validates exactly what we ship.
"""

import numpy as np

F32 = np.float32


def pad_index(i: int, dim: int) -> int:
    """``csrc/depth/kernels/device_functions.cuh:10-20``.  Equals ``i % dim``
    for ``-dim <= i <= dim``; the reference is UB beyond that (we assert)."""
    assert -dim <= i <= dim, f"pad_index({i}, {dim}) hits reference UB"
    return i % dim


def rgb_to_grayscale(img_chw: np.ndarray) -> np.ndarray:
    img = img_chw.astype(F32)
    out = np.empty(img.shape[1:], F32)
    h, w = out.shape
    for x in range(h):
        for y in range(w):
            r = F32(F32(0.2989) * img[0, x, y])
            g = F32(F32(0.5870) * img[1, x, y])
            b = F32(F32(0.1140) * img[2, x, y])
            out[x, y] = F32(F32(r + g) + b)
    return out


def mean_pool(img: np.ndarray, k: int) -> np.ndarray:
    h, w = img.shape
    oh, ow = -(-h // k), -(-w // k)
    out = np.empty((oh, ow), F32)
    for x in range(oh):
        for y in range(ow):
            s = F32(0)
            for i in range(k):
                for j in range(k):
                    s = F32(s + img[min(x * k + i, h - 1), min(y * k + j, w - 1)])
            out[x, y] = F32(s / F32(k * k))
    return out


def sad_cost(left: np.ndarray, right: np.ndarray, x: int, y: int,
             d: int, radius: int) -> F32:
    """``device_functions.cuh:53-73`` — inverted-SAD similarity."""
    h, w = left.shape
    total = F32(0)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            xi = pad_index(x + i, h)
            yi = pad_index(y + j, w)
            di = (y + j - d) % w  # pad_index; mod is the documented semantics
            total = F32(total + F32(F32(255) - abs(F32(left[xi, yi] - right[xi, di]))))
    return total


def cost_volume(left: np.ndarray, right: np.ndarray, min_d: int, max_d: int,
                radius: int) -> np.ndarray:
    """``ncc_matching_cost_volume_construction.cu:67-76``."""
    h, w = left.shape
    num_d = max_d - min_d + 1
    out = np.empty((h, w, num_d), F32)
    for x in range(h):
        for y in range(w):
            for t in range(num_d):
                out[x, y, t] = sad_cost(left, right, x, y, min_d + t, radius)
    return out


def mbm_aggregate(cv: np.ndarray, small: int, mid: int, large: int) -> np.ndarray:
    """``multi_block_matching_cost_aggregation.cu:58-88`` — product of three
    wrap-padded box sums."""
    h, w, nd = cv.shape

    def box(x, y, t, rx, ry):
        s = F32(0)
        for i in range(-rx, rx + 1):
            for j in range(-ry, ry + 1):
                s = F32(s + cv[(x + i) % h, (y + j) % w, t])
        return s

    out = np.empty_like(cv)
    for x in range(h):
        for y in range(w):
            for t in range(nd):
                hcost = box(x, y, t, small, large)
                vcost = box(x, y, t, large, small)
                ccost = box(x, y, t, mid, mid)
                out[x, y, t] = F32(F32(hcost * vcost) * ccost)
    return out


def wta(av: np.ndarray, min_d: int) -> np.ndarray:
    """``wta_disparity_selection.cu:22-30`` — first strict max wins; the
    initial best is FLT_MIN (positive), so all-zero rows pick index 0."""
    h, w, nd = av.shape
    out = np.empty((h, w), F32)
    for x in range(h):
        for y in range(w):
            best_c = np.finfo(F32).tiny
            best_d = 0
            for t in range(nd):
                if av[x, y, t] > best_c:
                    best_c = av[x, y, t]
                    best_d = t
            out[x, y] = F32(best_d + min_d)
    return out


def quadratic_peak(x1, y1, x2, y2, x3, y3):
    """``device_functions.cuh:22-46``."""
    x1, y1, x2, y2, x3, y3 = (F32(v) for v in (x1, y1, x2, y2, x3, y3))
    denominator = F32(F32(F32(x1 - x2) * F32(x2 - x3)) * F32(x1 - x3))
    if y1 > y2:
        peak = x1 if y1 > y3 else x3
    else:
        peak = x2 if y2 > y3 else x3
    if denominator != 0:
        a = F32(F32(x3 * F32(y2 - y1)) + F32(x2 * F32(y1 - y3)) + F32(x1 * F32(y3 - y2)))
        b = F32(F32(x1 * x1 * F32(y2 - y3)) + F32(x3 * x3 * F32(y1 - y2))
                + F32(x2 * x2 * F32(y3 - y1)))
        if a < 0:
            peak = F32(-b / F32(2 * a))
    return F32(peak)


def secondary_matching(left: np.ndarray, right: np.ndarray, av: np.ndarray,
                       disparity: np.ndarray, radius: int, k: int,
                       min_d_down: int = 0) -> np.ndarray:
    """``secondary_matching.cu:22-72``.  The aggregated volume is indexed at
    ``(d_idx + j) mod D`` (the framework's documented semantics; identical to
    the reference whenever ``min_d_down == 0``)."""
    hd, wd = disparity.shape
    nd = av.shape[2]
    out = disparity.astype(F32).copy()
    for x in range(hd):
        for y in range(wd):
            d_mbm = int(disparity[x, y])
            d_idx = d_mbm - min_d_down
            lo, hi = k * (d_mbm - 1), k * (d_mbm + 1)

            c_sad = np.finfo(F32).tiny
            d_sad = lo
            for d in range(lo, hi + 1):
                c = sad_cost(left, right, x * k, y * k, d, radius)
                if c > c_sad:
                    c_sad, d_sad = c, d
            if not (lo < d_sad < hi):
                continue

            mbm_c = lambda j: av[x, y, (d_idx + j) % nd]
            peak_mbm = quadratic_peak(d_mbm, mbm_c(0), d_mbm + 1, mbm_c(1),
                                      d_mbm - 1, mbm_c(-1))
            peak_sad = quadratic_peak(
                d_sad, c_sad,
                d_sad + 1, sad_cost(left, right, x * k, y * k, d_sad + 1, radius),
                d_sad - 1, sad_cost(left, right, x * k, y * k, d_sad - 1, radius))

            delta_mbm = F32(peak_mbm - F32(d_mbm))
            delta_sad = F32(peak_sad - F32(d_sad))
            sad_sub = F32(d_sad + delta_sad)
            if F32(delta_mbm * F32(sad_sub - F32(k * d_mbm))) > 0:
                out[x, y] = F32(sad_sub / F32(k))
            else:
                out[x, y] = F32(F32(F32(F32(d_mbm) + delta_mbm) + F32(sad_sub / F32(k))) / F32(2))
    return out


def upscale_vertical_fill(left: np.ndarray, disparity: np.ndarray,
                          k: int, threshold: float) -> np.ndarray:
    """``upscale_disparity_vertical_fill.cu:22-51`` with the framework's
    documented border semantics: the ``(k+1)*x`` color row is clamped to the
    last row, and rows ``1..k-1`` replicate row 0's anchor."""
    h = left.shape[0]
    hd, wd = disparity.shape
    out = np.zeros((h, wd), F32)
    for x in range(hd):
        for y in range(wd):
            prev_d = F32(k * disparity[x, y])
            out[k * x, y] = prev_d
            if x == 0:
                for i in range(1, k):
                    if k * x + i < h:
                        out[k * x + i, y] = prev_d
                continue
            next_d = F32(k * disparity[x - 1, y])
            prev_color = left[k * x, k * y]
            next_color = left[min((k + 1) * x, h - 1), k * y]
            for i in range(1, k):
                if k * x + i >= h:
                    break
                if abs(F32(prev_d - next_d)) <= threshold:
                    out[k * x + i, y] = F32(prev_d + F32(F32(i * F32(next_d - prev_d)) / F32(k)))
                else:
                    cur = left[k * x + i, k * y]
                    if abs(F32(cur - prev_color)) <= abs(F32(cur - next_color)):
                        out[k * x + i, y] = prev_d
                    else:
                        out[k * x + i, y] = next_d
    return out


def horizontal_fill(left: np.ndarray, vfilled: np.ndarray, k: int,
                    threshold: float) -> np.ndarray:
    """``horizontal_disparity_fill.cu:22-40`` with the right anchor clamped
    to the last grid column (documented deviation in the last band)."""
    h, w = left.shape
    wd = vfilled.shape[1]
    out = np.empty((h, w), F32)
    for x in range(h):
        for y in range(w):
            mod = y % k
            c = y // k
            prev_d = vfilled[x, c]
            next_d = vfilled[x, min(c + 1, wd - 1)]
            if abs(F32(prev_d - next_d)) <= threshold:
                out[x, y] = F32(prev_d + F32(F32(mod * F32(next_d - prev_d)) / F32(k)))
            else:
                prev_color = left[x, c * k]
                next_color = left[x, min(c * k + k, w - 1)]
                cur = left[x, y]
                if abs(F32(cur - prev_color)) <= abs(F32(cur - next_color)):
                    out[x, y] = prev_d
                else:
                    out[x, y] = next_d
    return out
