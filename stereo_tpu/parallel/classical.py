"""Distributed classical stereo engine: shard_map over a (data, tile, disp)
mesh with explicit ICI collectives.

This is the TPU-native replacement for everything the reference does with
CUDA shared-memory tiling and persistent single-GPU buffers (SURVEY.md
§2.4): the aggregation kernel's shared-memory halo tile
(``multi_block_matching_cost_aggregation.cu:36-51``) becomes a ring
``ppermute`` row-halo exchange between neighbor chips; the per-pixel serial
WTA scan (``wta_disparity_selection.cu:24-29``) becomes a local argmax plus
a cross-chip (value, index) max reduction over the ``disp`` axis; the
(H/k, W/k, D) cost volume never exists on any one chip — each disp-shard
builds only its disparity chunk (blockwise cost volume).

Sharding layout:

* ``data``  — leading batch axis of (N, 3, H, W) frame batches;
* ``tile``  — image rows (scanlines).  One input halo exchange of
  ``k * (large_mbm + cost_r + 1)`` full-res rows makes all window stages
  local; the ring wrap IS the reference's ``pad_index`` wrap at the global
  top/bottom borders.
* ``disp``  — the cost-volume disparity axis.  Secondary matching gathers
  each pixel's (2k+3)-tap dense-SAD window and 3 MBM parabola costs from
  their owning shard via masked ``psum``.

Correctness contract: bit-equal to the single-device engine
(``stereo_tpu.matching.classical``) — asserted by the equivalence tests on
a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MatchingConfig, MeshConfig
from .. import ops
from ..ops.cost_volume import MAX_INTENSITY
from ..ops.boxfilter import box_sum_1d, box_sum_2d
from ..ops.gather import take_lane, take_window_lanes
from ..ops.refinement import refine_from_window
from ..ops.fills import _select_fill
from .mesh import make_mesh


def k_halo_rows(config: MatchingConfig) -> int:
    """Full-resolution rows exchanged over the ring per side."""
    return config.k * (config.large_mbm_radius + config.cost_patch_radius + 1)


def _ring_halo_rows(x: jnp.ndarray, halo: int, axis_name: str,
                    n: int) -> jnp.ndarray:
    """Extend local rows with ``halo`` rows from the ring neighbors
    (wrap-around at the global borders, matching ``pad_index`` semantics).
    (H_local, W) -> (H_local + 2*halo, W)."""
    if n == 1:
        return jnp.concatenate([x[-halo:], x, x[:halo]], axis=0)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to next (down) shard
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to previous (up) shard
    top = lax.ppermute(x[-halo:], axis_name, fwd)   # prev shard's last rows
    bottom = lax.ppermute(x[:halo], axis_name, bwd)  # next shard's first rows
    return jnp.concatenate([top, x, bottom], axis=0)


def _cross_chip_argmax(values: jnp.ndarray, global_idx: jnp.ndarray,
                       axis_name: str):
    """First-maximum-wins argmax across a sharded axis: pmax of values, then
    pmin over the candidate indices achieving it (ties -> smallest global
    index, matching the reference's strict-``>`` scan)."""
    gmax = lax.pmax(values, axis_name)
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(values == gmax, global_idx, big)
    return gmax, lax.pmin(cand, axis_name)


def _owned_gather(volume: jnp.ndarray, local_pos: jnp.ndarray,
                  chunk: int, axis_name: str) -> jnp.ndarray:
    """Fetch ``volume[..., local_pos]`` from whichever disp-shard owns it:
    mask out-of-chunk positions locally, psum across the axis."""
    owned = (local_pos >= 0) & (local_pos < chunk)
    clipped = jnp.clip(local_pos, 0, chunk - 1)
    vals = take_lane(volume, clipped)
    return lax.psum(jnp.where(owned, vals, 0.0), axis_name)


def _sharded_frame(left_rgb, right_rgb, config: MatchingConfig,
                   n_tile: int, n_disp: int, use_pallas: bool = False):
    """Per-device computation for one frame (inside shard_map).

    ``left_rgb``/``right_rgb``: (3, H_local, W) local row-shards.
    Returns the (H_local, W) local disparity rows.

    With ``use_pallas=True`` (requires ``n_disp == 1``) the hot middle —
    cost volume, aggregation, WTA, dense-SAD window — runs in the fused
    Pallas kernels on each row-shard's halo-extended rows: the composition
    of the reference's two scaling ideas (shared-memory tiling ≈ VMEM
    streaming, multi-GPU ≈ the device mesh).  Bit-equal to the jnp path.
    """
    c = config
    k = c.k
    num_dd = c.num_disparities_down
    if num_dd % n_disp:
        raise ValueError(f"disparity count {num_dd} not divisible by "
                         f"disp axis {n_disp}")
    chunk = num_dd // n_disp
    halo_down = c.large_mbm_radius + c.cost_patch_radius + 1
    halo_full = k * halo_down

    ti = lax.axis_index("tile")
    di = lax.axis_index("disp")
    c0 = di * chunk                                   # chunk start (d-index)

    local_h = left_rgb.shape[-2]
    local_hd = local_h // k
    x0_abs = ti * local_hd                            # absolute first down-row
    h_full = local_h * n_tile

    # Stage 1: grayscale (local).
    lg = ops.rgb_to_grayscale(left_rgb)
    rg = ops.rgb_to_grayscale(right_rgb)

    # Halo exchange: one ring ppermute of input rows makes every windowed
    # stage local (the distributed analog of the CUDA shared-memory tile).
    lg_e = _ring_halo_rows(lg, halo_full, "tile", n_tile)
    rg_e = _ring_halo_rows(rg, halo_full, "tile", n_tile)

    # Stage 2: mean-pool downscale (local, halo rows aligned to k).
    ld = ops.mean_pool(lg_e, k)
    rd = ops.mean_pool(rg_e, k)
    w_d = ld.shape[-1]

    if use_pallas:
        if n_disp != 1:
            raise ValueError("pallas sharded path requires disp axis == 1")
        from ..ops.pallas.kernels import matching_core, sampled_window

        # Stages 3-5 fused: the kernels take the ring-exchanged rows as
        # their pre-padded halo (kernel halo is halo_down - 1 rows).
        disparity, mbm = matching_core(ld[1:-1], rd[1:-1], c,
                                       rows_prepadded=True)
        d_idx = (disparity - c.min_disparity_down).astype(jnp.int32)

        # Stage 6 window scan on sad_r-prepadded full-res rows.
        sad_r = c.sad_patch_radius
        sl = slice(halo_full - sad_r, halo_full + local_h + sad_r)
        window = sampled_window(lg_e[sl], rg_e[sl], disparity, c,
                                rows_prepadded=True)
        refined = refine_from_window(jnp.moveaxis(window, 0, -1), disparity,
                                     mbm[0], mbm[1], mbm[2], k)

        # Vertical fill needs the row above each local block: fetch the
        # neighbor's last refined row over the ring (wrap at the top).
        scaled = k * refined
        if n_tile == 1:
            neighbor_last = scaled[-1:]
        else:
            fwd = [(i, (i + 1) % n_tile) for i in range(n_tile)]
            neighbor_last = lax.ppermute(scaled[-1:], "tile", fwd)
        prev_row = jnp.concatenate([neighbor_last, scaled[:-1]], axis=0)
    else:
        # Stage 3: blockwise inverted-SAD cost volume — ONLY this shard's
        # disparity chunk.  Dynamic base roll once, static rolls per offset.
        area = (2 * c.cost_patch_radius + 1) ** 2
        rd_base = jnp.roll(rd, c.min_disparity_down + c0, axis=-1)
        planes = []
        for t in range(chunk):
            diff = jnp.abs(ld - jnp.roll(rd_base, t, axis=-1))
            planes.append(area * MAX_INTENSITY -
                          box_sum_2d(diff, c.cost_patch_radius,
                                     c.cost_patch_radius))
        volume = jnp.stack(planes, axis=-1)           # (He_d, W_d, chunk)

        # Stage 4: MBM aggregation (per-d independent -> local to the chunk).
        aggregated = ops.mbm_aggregate(volume, c.small_mbm_radius,
                                       c.mid_mbm_radius, c.large_mbm_radius)

        # Stage 5: WTA — local argmax over the chunk, then a cross-chip
        # (value, index) reduction over the disp axis.
        local_best = jnp.argmax(aggregated, axis=-1)
        local_val = jnp.max(aggregated, axis=-1)
        _, d_idx = _cross_chip_argmax(
            local_val, (local_best + c0).astype(jnp.int32), "disp")
        disparity = (d_idx + c.min_disparity_down).astype(aggregated.dtype)

        # Stage 6: secondary matching.  Dense SAD planes only for this
        # chunk's window range; window taps + MBM parabola costs fetched
        # from their owners via masked psum.
        win = 2 * k + 3
        n_dense_local = k * chunk + k + 3
        d_start = k * (c.min_disparity_down - 1) - 1  # global dense offset 0
        rg_base = jnp.roll(rg_e, d_start + k * c0, axis=-1)
        sad_r = c.sad_patch_radius
        sad_area = (2 * sad_r + 1) ** 2
        dense = []
        for s in range(n_dense_local):
            diff = jnp.abs(lg_e - jnp.roll(rg_base, s, axis=-1))
            cols = box_sum_1d(diff, sad_r, axis=-1)[..., ::k]
            rows = box_sum_1d(cols, sad_r, axis=-2)[..., ::k, :]
            dense.append(sad_area * MAX_INTENSITY - rows)
        dense = jnp.stack(dense, axis=-1)             # (He_d, W_d, S)

        owned = (d_idx >= c0) & (d_idx < c0 + chunk)
        start_local = jnp.clip(k * (d_idx - c0), 0, n_dense_local - win)
        window = take_window_lanes(dense, start_local, win, step=k)
        window = lax.psum(jnp.where(owned[..., None], window, 0.0), "disp")

        mbm = [_owned_gather(aggregated, jnp.mod(d_idx + j, num_dd) - c0,
                             chunk, "disp") for j in (-1, 0, 1)]
        refined = refine_from_window(window, disparity, mbm[0], mbm[1],
                                     mbm[2], k)

    # Stages 7-8: fills.  Vertical fill's bilateral colors index rows
    # k*x, (k+1)*x, k*x+i of the *global* stride-k column grid — gather the
    # (H, W_d) grid once (all_gather over tile), keep everything else local.
    grid_local = lg[:, ::k][:, :w_d]
    grid = lax.all_gather(grid_local, "tile", axis=0, tiled=True)  # (H, W_d)

    if not use_pallas:
        scaled_e = k * refined                        # extended down rows
        keep = slice(halo_down, halo_down + local_hd)
        scaled = scaled_e[keep]
        prev_row = scaled_e[halo_down - 1: halo_down - 1 + local_hd]

    x_abs = x0_abs + jnp.arange(local_hd)
    prev_color = grid[jnp.clip(k * x_abs, 0, h_full - 1)]
    next_color = grid[jnp.clip((k + 1) * x_abs, 0, h_full - 1)]

    rows = [scaled]
    for i in range(1, k):
        current_color = grid[jnp.clip(k * x_abs + i, 0, h_full - 1)]
        fill = _select_fill(scaled, prev_row, prev_color, next_color,
                            current_color, float(i), float(k),
                            float(c.threshold))
        # absolute row block 0 replicates its anchor (ops/fills.py deviation)
        fill = jnp.where((x_abs == 0)[:, None], scaled, fill)
        rows.append(fill)
    vfilled = jnp.stack(rows, axis=1).reshape(local_hd * k, w_d)

    lg_local = lg_e[halo_full: halo_full + local_h]
    return ops.horizontal_fill(lg_local, vfilled, k, float(c.threshold))


class ShardedClassicalEngine:
    """Batch engine over a (data, tile, disp) mesh.

    Requirements (asserted): batch divisible by ``data``; image height
    divisible by ``k * tile``; downscaled disparity count divisible by
    ``disp``.
    """

    def __init__(self, config: MatchingConfig, mesh_config: MeshConfig,
                 mesh: Optional[Mesh] = None):
        self.config = config
        self.mesh_config = mesh_config
        self.mesh = mesh if mesh is not None else make_mesh(mesh_config)
        mc = mesh_config
        if config.height % (config.k * mc.tile):
            raise ValueError("height must divide k * tile")
        if config.num_disparities_down % mc.disp:
            raise ValueError("disparity count must divide disp axis")

        self.use_pallas = self._select_pallas(config, mc)
        per_frame = functools.partial(_sharded_frame, config=config,
                                      n_tile=mc.tile, n_disp=mc.disp,
                                      use_pallas=self.use_pallas)

        if self.use_pallas:
            # lax.map rather than vmap: pallas_call under shard_map has no
            # batching rule for the manual-DMA kernels.
            def batched(left, right):      # local (N/data, 3, H/tile, W)
                return lax.map(lambda a: per_frame(a[0], a[1]),
                               (left, right))
        else:
            def batched(left, right):
                return jax.vmap(per_frame)(left, right)

        spec_in = P("data", None, "tile", None)
        spec_out = P("data", "tile", None)
        shard_fn = jax.shard_map(batched, mesh=self.mesh,
                                 in_specs=(spec_in, spec_in),
                                 out_specs=spec_out, check_vma=False)
        self._fn = jax.jit(shard_fn)

    @staticmethod
    def _select_pallas(config: MatchingConfig, mc: MeshConfig) -> bool:
        """Mirror of the single-device ``impl`` dispatch
        (``matching/classical.py``): honor an explicit ``impl`` setting,
        otherwise pick the Pallas kernels on TPU for large disparity
        counts.  Only available with an unsharded disparity axis."""
        c = config
        sad_r = c.sad_patch_radius
        eligible = (mc.disp == 1 and c.height % c.k == 0
                    and c.width % c.k == 0
                    and k_halo_rows(c) >= sad_r)
        if c.impl == "pallas":
            if not eligible:
                raise ValueError("impl='pallas' needs disp axis == 1, "
                                 "k-divisible dims, and halo >= sad radius")
            return True
        if c.impl == "xla":
            return False
        return (eligible and jax.default_backend() == "tpu"
                and c.num_disparities_down > 48)

    def compute_disparity_maps(self, left_batch, right_batch) -> jax.Array:
        """(N, 3, H, W) x2 -> (N, H, W); N must divide the data axis."""
        left = jnp.asarray(left_batch, jnp.float32)
        right = jnp.asarray(right_batch, jnp.float32)
        if left.shape[0] % self.mesh_config.data:
            raise ValueError("batch size must divide data axis")
        sharding = NamedSharding(self.mesh, P("data", None, "tile", None))
        return self._fn(jax.device_put(left, sharding),
                        jax.device_put(right, sharding))

    def warmup(self) -> None:
        c = self.config
        x = jnp.zeros((self.mesh_config.data, 3, c.height, c.width),
                      jnp.float32)
        jax.block_until_ready(self.compute_disparity_maps(x, x))
