"""Hand-written Pallas TPU kernels for the classical engine's hot stages.

Two fused kernels replace the reference's six hot CUDA kernels
(``csrc/depth/kernels/*.cu``):

* :func:`matching_core` — cost-volume construction (inverted SAD,
  ``ncc_matching_cost_volume_construction.cu:67-76``), multi-block
  aggregation (product of three box sums,
  ``multi_block_matching_cost_aggregation.cu:58-88``), WTA selection
  (``wta_disparity_selection.cu:22-30``) AND the three MBM parabola costs
  the refinement needs — one pass over the downscaled pair.  The
  (H_d, W_d, D) cost volume never exists anywhere: the d-loop carries only
  O(tile) state (running best value/index, previous aggregated plane, and
  the prev/next planes around the current winner, with mod-D wrap).

* :func:`sampled_window` — secondary matching's dense full-resolution SAD
  scan (``secondary_matching.cu:45-53``) fused with per-pixel window
  extraction: each dense-disparity plane is computed in VMEM and
  immediately scattered into the pixels' (2k+3)-tap windows by masked
  select, so the (H_d, W_d, ~71) dense volume never exists either.

Each grid program DMAs its (overlapping) input row band from HBM into VMEM
scratch — the same tiling strategy as the reference's shared-memory halo
tile (``multi_block_matching_cost_aggregation.cu:36-51``), with the wrap
boundary pre-applied by the XLA wrapper (``pad_index`` semantics).  All
loops are static.  ``interpret=True`` on non-TPU backends for the oracle
tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import MatchingConfig

MAX_INTENSITY = 255.0

# Disparity planes are processed in chunks: a fori_loop over ceil(D/chunk)
# iterations whose body unrolls ``chunk`` planes with static slice offsets,
# then rolls the right-image VMEM band by ``chunk`` lanes.  Mosaic compile
# time scales with the chunk (not with D), while the roll traffic and loop
# overhead amortize over ``chunk`` planes — a roll-by-one per plane measured
# ~1.1 ms/frame slower than chunk=16 at the KITTI config, while a full
# unroll (no roll at all) measured no faster but costs minutes of Mosaic
# compile per ~33 planes.  When D fits in a single chunk the loop (and the
# roll) disappears entirely.
_UNROLL_CHUNK = 16


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _row_tile(h: int, target: int) -> int:
    """Largest divisor of ``h`` that is <= target."""
    for t in range(min(target, h), 0, -1):
        if h % t == 0:
            return t
    return h


def _box_lanes(x, radius):
    """Window sum along the last (lane) axis via static shifted slices:
    input cols cover [-radius, W + radius) -> output cols [0, W)."""
    if radius == 0:
        return x
    w = x.shape[-1] - 2 * radius
    acc = x[..., 0:w]
    for i in range(1, 2 * radius + 1):
        acc = acc + x[..., i:i + w]
    return acc


def _box_sublanes(x, radius):
    """Window sum along the row axis, same convention."""
    if radius == 0:
        return x
    h = x.shape[-2] - 2 * radius
    acc = x[..., 0:h, :]
    for i in range(1, 2 * radius + 1):
        acc = acc + x[..., i:i + h, :]
    return acc


# ---------------------------------------------------------------------------
# Kernel 1: cost volume + aggregation + WTA + MBM parabola costs
# ---------------------------------------------------------------------------

def _matching_core_kernel(ld_hbm, rd_hbm, disp_ref, mbm_ref, ld_v, rd_v,
                          acc, sems, *, config, tile_rows, band_rows,
                          ld_cols, rd_cols):
    c = config
    num_d = c.num_disparities_down
    r = c.cost_patch_radius
    s, m, L = c.small_mbm_radius, c.mid_mbm_radius, c.large_mbm_radius
    area = (2 * r + 1) ** 2
    w_d = disp_ref.shape[-1]
    i = pl.program_id(0)

    row0 = i * tile_rows
    # DMA bands are (8, 128)-tile aligned (allocation padded by the
    # wrapper); the logical extents are recovered by value-level slicing.
    cp_l = pltpu.make_async_copy(
        ld_hbm.at[pl.ds(row0, ld_v.shape[0]), :], ld_v, sems.at[0])
    cp_r = pltpu.make_async_copy(
        rd_hbm.at[pl.ds(row0, rd_v.shape[0]), :], rd_v, sems.at[1])
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    ld = ld_v[...][:band_rows, :ld_cols]

    # Accumulator state lives in VMEM scratch refs (slots of ``acc``) so
    # the d-loop's live set stays one iteration deep — carrying it
    # functionally blew the Mosaic scoped-vmem stack (79 MB at tile 32).
    BEST, IDX, PREV, PLANE0, MPREV, MNEXT, PEND, LAST = range(8)
    shape = (tile_rows, w_d)
    acc[BEST] = jnp.full(shape, -jnp.inf, jnp.float32)
    acc[IDX] = jnp.zeros(shape, jnp.float32)
    acc[MPREV] = jnp.zeros(shape, jnp.float32)
    acc[MNEXT] = jnp.zeros(shape, jnp.float32)
    acc[PEND] = jnp.zeros(shape, jnp.float32)
    acc[PREV] = jnp.zeros(shape, jnp.float32)

    def step(d, rd_window, d_value, valid=True):
        """One disparity plane; ``rd_window`` already aligned so column y
        holds right[y - (min_disparity_down + d)].  ``valid`` masks the
        tail planes of the last chunk (their window reads rolled-in
        garbage): an invalid plane can never become the best, and every
        other accumulator write is conditioned on plane identity."""
        diff = jnp.abs(ld - rd_window)
        cost = area * MAX_INTENSITY - _box_lanes(_box_sublanes(diff, r), r)
        # cost rows cover [-L, tile+L), cols [-L, w_d+L)
        hrz = _box_lanes(
            _box_sublanes(cost, s)[(L - s):(L - s) + tile_rows], L)
        vrt = _box_lanes(
            _box_sublanes(cost, L), s)[:, (L - s):(L - s) + w_d]
        ctr = _box_lanes(
            _box_sublanes(cost, m)[(L - m):(L - m) + tile_rows],
            m)[:, (L - m):(L - m) + w_d]
        agg = hrz * vrt * ctr

        first = jnp.float32(d_value) == 0.0
        acc[PLANE0] = jnp.where(first, agg, acc[PLANE0])
        is_new_best = (agg > acc[BEST]) & valid  # strict: first max wins
        acc[MPREV] = jnp.where(is_new_best, acc[PREV], acc[MPREV])
        acc[MNEXT] = jnp.where(acc[PEND] > 0, agg, acc[MNEXT])
        acc[PEND] = is_new_best.astype(jnp.float32)
        acc[IDX] = jnp.where(is_new_best, jnp.float32(d_value), acc[IDX])
        acc[BEST] = jnp.where(is_new_best, agg, acc[BEST])
        acc[PREV] = agg
        acc[LAST] = jnp.where(jnp.float32(d_value) == num_d - 1, agg,
                              acc[LAST])

    # Balanced chunks: ceil-dividing D by the chunk count (instead of using
    # the maximum chunk everywhere) keeps the masked tail to < n_chunks
    # planes of wasted compute (a fixed chunk of 16 would waste 15 of 48
    # planes at KITTI's D=33).  Chunk sizes 16/32/48 measured identical
    # throughput at KITTI (1.54-1.57 ms/frame); compile time alone scales
    # with the chunk, so the smallest is the right default.
    n_chunks = -(-num_d // _UNROLL_CHUNK)
    chunk = -(-num_d // n_chunks)
    if n_chunks == 1:
        rd = rd_v[...][:band_rows, :rd_cols]
        for d in range(num_d):
            off = num_d - 1 - d
            step(d, rd[:, off:off + ld.shape[-1]], float(d))
    else:
        # Chunked unroll: each fori iteration handles ``chunk`` planes at
        # static slice offsets, then rolls the right band by ``chunk``
        # lanes in place.  The wrapped-in garbage (first j*chunk columns)
        # stays left of the smallest slice start (num_d - 1 - (chunk - 1)
        # >= 0 because chunk <= num_d); tail planes d >= num_d of the last
        # chunk are masked via ``valid``.
        def body(j, _):
            rd = rd_v[...][:band_rows, :rd_cols]
            base = (j * chunk).astype(jnp.float32)
            for t in range(chunk):
                off = num_d - 1 - t
                d_value = base + float(t)
                step(t, rd[:, off:off + ld.shape[-1]], d_value,
                     valid=d_value < float(num_d))
            rd_v[...] = pltpu.roll(rd_v[...], chunk, axis=1)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    # mod-D wrap of the parabola neighbours (ops/refinement.py semantics)
    best_idx = acc[IDX]
    mbm_prev = jnp.where(best_idx == 0, acc[LAST], acc[MPREV])
    mbm_next = jnp.where(best_idx == num_d - 1, acc[PLANE0], acc[MNEXT])

    disp_ref[...] = best_idx + float(c.min_disparity_down)
    mbm_ref[0] = mbm_prev
    mbm_ref[1] = acc[BEST]
    mbm_ref[2] = mbm_next


def matching_core(left_down: jnp.ndarray, right_down: jnp.ndarray,
                  config: MatchingConfig,
                  rows_prepadded: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Downscaled pair -> (disparity_down, mbm_costs).

    ``disparity_down``: (H_d, W_d) float WTA winners in downscaled units
    (including the min-disparity offset).  ``mbm_costs``: (3, H_d, W_d) —
    aggregated cost at (winner-1, winner, winner+1) with mod-D wrap.

    With ``rows_prepadded=True`` the inputs already carry
    ``large_mbm_radius + cost_patch_radius`` extra rows top and bottom
    (e.g. from the sharded engine's ring halo exchange) and only columns
    are wrap-padded here — the composition point for running this kernel
    per row-shard under ``shard_map``.
    """
    c = config
    num_d = c.num_disparities_down
    halo = c.large_mbm_radius + c.cost_patch_radius
    if rows_prepadded:
        h_d = left_down.shape[0] - 2 * halo
    else:
        h_d = left_down.shape[0]
    w_d = left_down.shape[1]
    # Output blocks must be 8-row aligned; heights without an aligned
    # divisor (Middlebury: 540) run on a padded grid and crop the result.
    tile = _row_tile(h_d, 64)
    if tile % 8:
        tile = 64
    h_pad = _round_up(h_d, tile)
    band = tile + 2 * halo

    # wrap pre-pad (pad_index semantics); right additionally padded left so
    # every disparity's shift (min_disparity_down + d) is a static slice.
    max_shift = c.min_disparity_down + num_d - 1
    row_pad = (0, 0) if rows_prepadded else (halo, halo)
    ld_pad = jnp.pad(left_down, (row_pad, (halo, halo)), mode="wrap")
    # right extent needed is halo - min_shift, which can go negative when
    # the minimum disparity exceeds the halo (Middlebury: min_dd 37 > 11)
    right_cols = max(halo - c.min_disparity_down, 0)
    rd_pad = jnp.pad(right_down, (row_pad,
                                  (halo + max_shift, right_cols)),
                     mode="wrap")
    ld_cols, rd_cols = ld_pad.shape[1], rd_pad.shape[1]

    # DMA alignment: band rows to a multiple of 8, widths to 128 lanes
    # (zero fill; the kernel value-slices back to the logical extents).
    # Rows also extend to cover the padded grid's last band.
    band_a = _round_up(band, 8)
    rows_needed = (h_pad - tile) + band_a

    def align(x):
        return jnp.pad(x, ((0, rows_needed - x.shape[0]),
                           (0, _round_up(x.shape[1], 128) - x.shape[1])))
    ld_pad = align(ld_pad)
    rd_pad = align(rd_pad)

    kernel = functools.partial(_matching_core_kernel, config=c,
                               tile_rows=tile, band_rows=band,
                               ld_cols=ld_cols, rd_cols=rd_cols)
    disp, mbm = pl.pallas_call(
        kernel,
        grid=(h_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((tile, w_d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile, w_d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, w_d), jnp.float32),
            jax.ShapeDtypeStruct((3, h_pad, w_d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((band_a, ld_pad.shape[1]), jnp.float32),
            pltpu.VMEM((band_a, rd_pad.shape[1]), jnp.float32),
            pltpu.VMEM((8, tile, w_d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(ld_pad, rd_pad)
    return disp[:h_d], mbm[:, :h_d]


# ---------------------------------------------------------------------------
# Kernel 2: dense SAD scan + per-pixel window extraction
# ---------------------------------------------------------------------------

def _sampled_window_kernel(lg_hbm, rg_hbm, didx_ref, win_ref, lg_v, rg_v,
                           acc, sems, *, k, sad_r, num_dense, tile_rows, w_d,
                           band_rows, w_phase_l, a_lo, chunk, n_chunks,
                           roll_c, offs):
    win = 2 * k + 3
    area = (2 * sad_r + 1) ** 2
    i = pl.program_id(0)

    row0 = i * tile_rows * k
    cp_l = pltpu.make_async_copy(
        lg_hbm.at[:, pl.ds(row0, lg_v.shape[1]), :], lg_v, sems.at[0])
    cp_r = pltpu.make_async_copy(
        rg_hbm.at[:, pl.ds(row0, rg_v.shape[1]), :], rg_v, sems.at[1])
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    d_idx = didx_ref[...].astype(jnp.int32)      # (tile, w_d)
    lg = lg_v[...]                               # (k, band_a, wl_pad)

    # ROW box + stride-k row sampling as ONE banded 0/1 matmul (Mosaic has
    # no strided slices): output row x sums band rows [k*x, k*x + 2r] —
    # (tile, band) @ (band, w) on the MXU replaces the 2r+1 shifted VPU
    # adds plus the separate row-selection matmul.  Exact for the suite's
    # integer-valued images (every partial sum is fp32-representable);
    # float ties on hardware are covered by the 0.5 px golden gates.
    # LANE sampling needs no matmul at all: the wrapper pre-splits both
    # images into their k column phases, so every lane here is already on
    # the downscaled stride-k grid.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, band_rows), 1)
    row_x = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, band_rows), 0)
    box_rows = ((row_i >= k * row_x)
                & (row_i <= k * row_x + 2 * sad_r)).astype(jnp.float32)

    for s2 in range(win):
        acc[s2] = jnp.zeros((tile_rows, w_d), jnp.float32)

    def step(rg_all, tt, t_value, valid=True):
        # Per L-phase p: |L_p - R_{p2}| on the phase grid, row box, row
        # compression — exactly the per-column values the full-resolution
        # formulation produces (ops/refinement.py::sampled_sad_volume), so
        # the downstream association order can be matched bit-exactly.
        compressed = []
        for p in range(k):
            p2, off = offs[tt][p]
            diff = jnp.abs(lg[p, :band_rows, :w_phase_l]
                           - rg_all[p2, :band_rows, off:off + w_phase_l])
            compressed.append(jnp.dot(box_rows, diff,
                                      preferred_element_type=jnp.float32))
        # Lane box at the sampled centers: tap dc lives in phase dc mod k
        # at phase-column offset floor(dc/k).  Accumulated in dc order
        # -r..r — the exact association order of _box_lanes, keeping the
        # kernel bit-identical to the XLA path.
        plane = None
        for dc in range(-sad_r, sad_r + 1):
            p = dc % k
            a = (dc - p) // k
            term = compressed[p][:, a - a_lo:a - a_lo + w_d]
            plane = term if plane is None else plane + term
        plane = area * MAX_INTENSITY - plane
        slot = t_value - k * d_idx
        for s2 in range(win):
            acc[s2] = jnp.where((slot == s2) & valid, plane, acc[s2])

    if n_chunks == 1:
        rg_all = rg_v[...]
        for t in range(num_dense):
            step(rg_all, t, t)
    else:
        # Chunked unroll (see _matching_core_kernel): each fori iteration
        # handles ``chunk`` dense planes with STATIC phase/offset tables,
        # then rolls the R phase bands right by chunk/k lanes so the next
        # chunk reads the same static offsets.  The wrapper reserves a
        # (n_chunks-1)*chunk/k left margin, so the garbage that wraps in
        # at the left never reaches a read slice.
        def body(j, _):
            rg_all = rg_v[...]
            base = j * chunk
            for tt in range(chunk):
                step(rg_all, tt, base + tt, valid=base + tt < num_dense)
            rg_v[...] = pltpu.roll(rg_v[...], roll_c, axis=2)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    for s2 in range(win):
        win_ref[s2] = acc[s2]


def sampled_window(left_gray: jnp.ndarray, right_gray: jnp.ndarray,
                   disparity_down: jnp.ndarray, config: MatchingConfig,
                   rows_prepadded: bool = False) -> jnp.ndarray:
    """Full-res pair + WTA winners -> (2k+3, H_d, W_d) per-pixel dense-SAD
    windows (tap s = similarity at full-res disparity k*(d_mbm-1)-1+s).

    The dense scan only ever needs the stride-k grid of downscaled pixel
    centers, so both images are pre-split into their k column PHASES
    (phase p, column q <-> full-res column k*q + p) and every kernel lane
    is a needed output column.  The old formulation computed the lane box
    at full resolution and subsampled with a (full_w x w_d) 0/1 selection
    matmul per dense plane — ~22 GFLOP/frame of pure selection at the
    KITTI config, measured 1.25 of the classical path's 1.5 ms/frame.

    With ``rows_prepadded=True`` the grayscale inputs already carry
    ``sad_patch_radius`` extra full-res rows top and bottom (sharded
    engine: sliced from the ring halo exchange) and only columns are
    wrap-padded here."""
    c = config
    k = c.k
    sad_r = c.sad_patch_radius
    h_d, w_d = disparity_down.shape
    num_d = c.num_disparities_down
    num_dense = k * (num_d + 1) + 3
    d_start = k * (c.min_disparity_down - 1) - 1
    win = 2 * k + 3
    full_w = left_gray.shape[-1]

    # 8-row-aligned tiles; unaligned heights run on a padded grid + crop.
    tile = _row_tile(h_d, 16)
    if tile % 8:
        tile = 16
    h_pad = _round_up(h_d, tile)
    band = k * tile + 2 * sad_r

    # Chunking: phase-coherent rolls need chunk % k == 0.
    n_chunks = -(-num_dense // (2 * _UNROLL_CHUNK))
    chunk = _round_up(-(-num_dense // n_chunks), k)
    n_chunks = -(-num_dense // chunk)
    roll_c = chunk // k
    margin = (n_chunks - 1) * roll_c

    # Column taps dc in [-r, r]: tap dc = phase (dc mod k) at phase-column
    # offset floor(dc/k) relative to the center.
    a_lo = -((sad_r + k - 1) // k)
    a_hi = sad_r // k
    w_phase_l = w_d + (a_hi - a_lo)

    # Static per-(tt, p) R phase + slice offset: dense plane t matches
    # L column k*q + p against R column k*q + p - (d_start + t) = phase
    # p2 = u mod k, phase-column q + floor(u/k), u = p - d_start - t.
    offs, b0s = [], []
    for tt in range(chunk):
        row = []
        for p in range(k):
            u = p - d_start - tt
            p2 = u % k
            b0 = (u - p2) // k
            row.append((p2, b0))
            b0s.append(b0)
        offs.append(row)
    b_min, b_max = min(b0s), max(b0s)
    offs = tuple(tuple((p2, margin + b0 - b_min) for (p2, b0) in row)
                 for row in offs)
    wr_width = margin + (b_max - b_min) + w_phase_l

    row_pad = (0, 0) if rows_prepadded else (sad_r, sad_r)

    def to_phases(img, col_lo, width):
        """(rows, W) full-res -> (k, rows, width) phase split starting at
        phase column ``col_lo`` (full-res column k*col_lo), wrap columns."""
        lo = -k * col_lo
        hi = k * (col_lo + width) - full_w
        p = jnp.pad(img, (row_pad, (max(lo, 0), max(hi, 0))), mode="wrap")
        # A window that starts right of column 0 / ends left of the edge
        # needs a slice, not a (negative) pad.
        if lo < 0:
            p = p[:, -lo:]
        if hi < 0:
            p = p[:, :hi]
        p = p.reshape(p.shape[0], width, k)
        return jnp.moveaxis(p, -1, 0)

    lph = to_phases(left_gray, a_lo, w_phase_l)
    rph = to_phases(right_gray, a_lo + b_min - margin, wr_width)

    band_a = _round_up(band, 8)
    rows_needed = k * (h_pad - tile) + band_a

    def align(x):
        return jnp.pad(x, ((0, 0), (0, rows_needed - x.shape[1]),
                           (0, _round_up(x.shape[2], 128) - x.shape[2])))
    lph = align(lph)
    rph = align(rph)

    d_idx = disparity_down.astype(jnp.int32) - c.min_disparity_down
    d_idx = jnp.pad(d_idx, ((0, h_pad - h_d), (0, 0)))

    kernel = functools.partial(_sampled_window_kernel, k=k, sad_r=sad_r,
                               num_dense=num_dense, tile_rows=tile, w_d=w_d,
                               band_rows=band, w_phase_l=w_phase_l,
                               a_lo=a_lo, chunk=chunk, n_chunks=n_chunks,
                               roll_c=roll_c, offs=offs)
    out = pl.pallas_call(
        kernel,
        grid=(h_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((tile, w_d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((win, tile, w_d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((win, h_pad, w_d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, band_a, lph.shape[2]), jnp.float32),
            pltpu.VMEM((k, band_a, rph.shape[2]), jnp.float32),
            pltpu.VMEM((win, tile, w_d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(lph, rph, d_idx)
    return out[:, :h_d]
