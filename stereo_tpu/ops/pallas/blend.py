"""Fused probability-volume upsample + 65-way shifted-view blend.

Deep3D's view-synthesis head upsamples the (D, h, w) softmax volume
bilinearly to full resolution and blends D shifted copies of the left view
(reference ``deep3d.py:155,169-183``).  Done naively that materializes a
(D, H, W) volume in HBM (127 MB at the native 384x1280 operating point) and
re-reads it once — ~1.7 ms of the 3.8 ms Deep3D forward is this tail.

Bilinear resize is separable, so the fusion splits it:

* columns (x4 along the 320 -> 1280 lane axis) upsample in XLA on the LOW
  row count — a 32 MB intermediate instead of 127 MB;
* rows + blend fuse here: each grid program DMAs its low-resolution row
  band (all D planes) and its view rows, row-interpolates with one small
  constant-matrix MXU contraction per disparity plane, and accumulates
  ``sum_d prob[d] * view[..., y+d]`` entirely in VMEM.

The row-interpolation matrix is exactly ``jax.image.resize``'s bilinear
kernel (align_corners=False; edge clamping realized by edge-padding the
band), so the fused path matches the reference composition to float
rounding — pinned by the equivalence tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Negative results, recorded so they aren't retried (v5e, 384x1280/D=65):
# * lane-chunked register accumulators (256-lane blocks, functional accs,
#   one store per finished block): 0.607 vs 0.622 ms/frame — the VMEM
#   accumulator traffic is NOT the kernel's bottleneck; the irreducible
#   per-plane view shift + the 65 K=18 row-interp matmuls are.
# * moving the column upsample INTO the kernel as a per-plane MXU matmul
#   (K=w_low, fp32-HIGHEST) to empty the XLA side entirely: 0.824 vs
#   0.513 ms — the extra 65 x (band, w_low)@(w_low, w) contractions do
#   not overlap the FMA stream.  The phase-interleave XLA column upsample
#   (``_column_upsample``) is the best known split.


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _row_interp_matrix(tile: int, scale: int) -> np.ndarray:
    """(tile, tile//scale + 2) bilinear row-interpolation matrix.

    Row x of an output tile samples source coordinate (x + 0.5)/scale - 0.5
    relative to the tile's first source row; the band carries ONE edge row
    above and below (band row b holds source row b - 1), which realizes
    jax.image.resize's coordinate clamping at the global borders.
    """
    band = tile // scale + 2
    m = np.zeros((tile, band), np.float32)
    for x in range(tile):
        sx = (x + 0.5) / scale - 0.5
        r0 = int(np.floor(sx))
        w1 = sx - r0
        m[x, r0 + 1] += 1.0 - w1
        m[x, r0 + 2] += w1
    return m


def pick_row_tile(h: int, scale: int):
    """Largest divisor of ``h`` <= 64 that is a multiple of 8 (output-block
    row alignment) and of ``scale`` (whole source rows per tile); None if no
    such tile exists (callers fall back to the XLA composition)."""
    for t in range(min(64, h), 7, -1):
        if h % t == 0 and t % 8 == 0 and t % scale == 0:
            return t
    return None


def _blend_kernel(prob_hbm, view_hbm, rmat_ref, out_ref, prob_v, view_v,
                  acc, sems, *, num_d, tile, scale, w, w_pad,
                  view_cols):
    band = tile // scale + 2
    i = pl.program_id(0)

    # DMA rows must be (8)-tile aligned: the scratch holds band rounded up
    # to 8 (the wrapper pads the source so the over-read stays in bounds);
    # value-level slices below recover the logical band.
    cp_p = pltpu.make_async_copy(
        prob_hbm.at[:, pl.ds(i * (tile // scale), prob_v.shape[1]), :],
        prob_v, sems.at[0])
    cp_v = pltpu.make_async_copy(
        view_hbm.at[:, pl.ds(i * tile, tile), :], view_v, sems.at[1])
    cp_p.start()
    cp_v.start()
    cp_p.wait()
    cp_v.wait()

    rmat = rmat_ref[...][:, :band]                            # (tile, band)
    acc[0] = jnp.zeros((tile, w_pad), jnp.float32)
    acc[1] = jnp.zeros((tile, w_pad), jnp.float32)
    acc[2] = jnp.zeros((tile, w_pad), jnp.float32)

    # One small row-interp matmul per disparity plane, consumed IMMEDIATELY
    # by the three shifted FMAs: a chunk-batched dot_general whose result
    # stays live across the unrolled FMAs measured 4.6x slower (358 MB of
    # register-allocator spill slots); this form runs in 0.40 ms/frame at
    # the native 384x1280 / D=65 point (~0.18 ms of which is the unaligned
    # lane shift of the view window).
    for d in range(num_d):
        plane = jax.lax.dot_general(
            rmat, prob_v[d, :band, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,   # fp32 interp weights
            preferred_element_type=jnp.float32)               # (tile, w)
        vs = view_v[...][:, :, d:d + w_pad]
        acc[0] = acc[0] + plane * vs[0]
        acc[1] = acc[1] + plane * vs[1]
        acc[2] = acc[2] + plane * vs[2]

    out_ref[0] = acc[0]
    out_ref[1] = acc[1]
    out_ref[2] = acc[2]


def _upsample_rows_blend(prob_cols_up: jnp.ndarray, view: jnp.ndarray,
                         scale: int, num_d: int) -> jnp.ndarray:
    """(D, h_low, W) column-upsampled volume + (3, H, W) view -> (3, H, W).

    Row-bilinear-upsamples the volume by ``scale`` and blends
    ``sum_d prob[d, x, y] * view[c, x, y + d]`` (left-shift, zero fill).
    """
    d, h_low, w = prob_cols_up.shape
    _, h, w_v = view.shape
    assert d == num_d and h == scale * h_low and w_v == w

    tile = pick_row_tile(h, scale)
    assert tile is not None, f"no legal row tile for h={h}, scale={scale}"
    band = tile // scale + 2

    w_pad = _round_up(w, 128)
    view_cols = w_pad + num_d - 1
    view_cols_a = _round_up(view_cols, 128)

    # One edge row above and below (jax.image.resize clamps coordinates);
    # lane-pad the volume, zero-pad the view's shift window.  The bottom
    # carries extra edge rows so the last program's 8-aligned DMA band
    # (band_a rows) stays in bounds.
    band_a = _round_up(band, 8)
    bottom = 1 + (band_a - band)
    prob_pad = jnp.pad(prob_cols_up, ((0, 0), (1, bottom), (0, w_pad - w)),
                       mode="edge")
    view_pad = jnp.pad(view, ((0, 0), (0, 0), (0, view_cols_a - w)))
    rmat = jnp.asarray(np.pad(_row_interp_matrix(tile, scale),
                              ((0, 0), (0, 128 - band))))

    kernel = functools.partial(
        _blend_kernel, num_d=num_d, tile=tile, scale=scale,
        w=w, w_pad=w_pad, view_cols=view_cols)
    scratch = [
        pltpu.VMEM((num_d, band_a, w_pad), jnp.float32),
        pltpu.VMEM((3, tile, view_cols_a), jnp.float32),
        pltpu.VMEM((3, tile, w_pad), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(h // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((tile, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, tile, w_pad), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(prob_pad, view_pad, rmat)
    return out[:, :, :w]


def _column_upsample(prob: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x``scale`` along the LAST axis via phase decomposition.

    ``jax.image.resize`` lowers this to a gather that measures 0.192 ms on
    the (1, 65, 96, 320) -> (..., 1280) volume on v5e; the same math as
    ``scale`` interleaved 2-tap FMA phases (out[s*q + r] = a_r * P[q + o_r]
    + b_r * P[q + o_r + 1], coordinates clamped at the borders) runs in
    0.034 ms and matches resize to 6e-8.  Phase r samples source coordinate
    (r + 0.5)/scale - 0.5 relative to q — the align_corners=False kernel."""
    pm1 = jnp.concatenate([prob[..., :1], prob[..., :-1]], axis=-1)
    pp1 = jnp.concatenate([prob[..., 1:], prob[..., -1:]], axis=-1)
    phases = []
    for r in range(scale):
        s = (r + 0.5) / scale - 0.5
        lo = int(np.floor(s))
        frac = np.float32(s - lo)
        src0, src1 = (pm1, prob) if lo == -1 else (prob, pp1)
        phases.append((1.0 - frac) * src0 + frac * src1)
    out = jnp.stack(phases, axis=-1)
    return out.reshape(*prob.shape[:-1], scale * prob.shape[-1])


def upsample_blend(prob_low_ndhw: jnp.ndarray, view_nchw: jnp.ndarray,
                   scale: int) -> jnp.ndarray:
    """Fused ``resize(prob, x scale, bilinear)`` + ``weighted_shift_sum``.

    ``prob_low``: (N, D, H/scale, W/scale) softmax disparity probabilities at
    the volume's computed resolution; ``view``: (N, 3, H, W) full-res left
    views.  Returns the synthesized right views (N, 3, H, W), float32.

    Column upsampling runs in XLA at the low row count (separable bilinear);
    rows + blend run in the fused Pallas kernel.  Equivalent to
    ``weighted_shift_sum(jax.image.resize(prob, ...), view)`` to float
    rounding (tested).
    """
    n, num_d, h_low, w_low = prob_low_ndhw.shape
    _, c, h, w = view_nchw.shape
    assert h == scale * h_low and w == scale * w_low and c == 3

    prob = prob_low_ndhw.astype(jnp.float32)
    view = view_nchw.astype(jnp.float32)

    cols_up = _column_upsample(prob, scale)
    run = functools.partial(_upsample_rows_blend, scale=scale, num_d=num_d)
    if n == 1:
        return run(cols_up[0], view[0])[None]
    return jax.lax.map(lambda ab: run(ab[0], ab[1]), (cols_up, view))
