"""Classical multi-block-matching stereo engine.

The reference runs 8 CUDA kernels back-to-back on one stream writing into
persistent device buffers (``csrc/depth/stereo_matching.cc:22-43``,
``csrc/depth/buffer/device_buffer.cc:3-12``).  The TPU-native equivalent is a
single functional graph under ``jax.jit``: XLA owns buffer reuse/donation and
fuses the elementwise stages, so there is no buffer class at all.

Stage order and unit conventions (``stereo_matching.cc:45-114``):

1. grayscale (full res, 0..255)
2. mean-pool downscale by ``k``
3. inverted-SAD cost volume at downscaled res; disparity axis covers
   ``[min/k, max/k]`` (integer division)
4. multi-block aggregation (product of three box sums)
5. WTA argmax -> disparities in *downscaled* units (incl. ``min/k`` offset)
6. secondary matching at full res -> subpixel, still downscaled units
7. upscale (multiply by ``k``) + vertical fill
8. horizontal fill -> (H, W) full-res disparity map in full-res units
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import MatchingConfig
from .. import ops


def compute_disparity_map(left_rgb: jnp.ndarray, right_rgb: jnp.ndarray,
                          config: MatchingConfig) -> jnp.ndarray:
    """(3, H, W) float RGB pair (0..255) -> (H, W) float disparity map.

    Pure function of its inputs; safe to ``jax.jit`` with ``config`` static
    and to ``vmap``/``shard_map`` over batches of frames.
    """
    left_gray = ops.rgb_to_grayscale(left_rgb)
    right_gray = ops.rgb_to_grayscale(right_rgb)
    return compute_disparity_from_grayscale(left_gray, right_gray, config)


def compute_disparity_from_grayscale(left_gray: jnp.ndarray,
                                     right_gray: jnp.ndarray,
                                     config: MatchingConfig) -> jnp.ndarray:
    """Stages 2-8 on precomputed (H, W) grayscale images."""
    c = config
    impl = c.impl
    if impl == "auto":
        # The Pallas kernels stream the cost volume through VMEM and run the
        # stride-k sampling as MXU selection matmuls — measured 1.5x faster
        # than the XLA path at the KITTI config (1.54 vs 2.32 ms/frame) and
        # >2x at Middlebury's 94 planes (18.8 ms vs ~50 ms); chunked
        # unrolling keeps Mosaic compile time O(chunk), so they win at
        # every disparity count.
        # Off-TPU the kernels would run interpreted — always use XLA there.
        divisible = c.height % c.k == 0 and c.width % c.k == 0
        impl = "pallas" if (divisible and
                            jax.default_backend() == "tpu") else "xla"
    if impl == "pallas":
        from ..ops.pallas import classical_fused
        return classical_fused.compute_disparity_from_grayscale(
            left_gray, right_gray, c)

    left_down = ops.mean_pool(left_gray, c.k)
    right_down = ops.mean_pool(right_gray, c.k)

    volume = ops.sad_cost_volume(left_down, right_down,
                                 c.min_disparity_down, c.max_disparity_down,
                                 c.cost_patch_radius)
    aggregated = ops.mbm_aggregate(volume, c.small_mbm_radius,
                                   c.mid_mbm_radius, c.large_mbm_radius)
    disparity_down = ops.wta_disparity(aggregated, c.min_disparity_down)
    refined = ops.secondary_matching(left_gray, right_gray, aggregated,
                                     disparity_down, c.k, c.sad_patch_radius,
                                     c.min_disparity_down)
    vfilled = ops.upscale_vertical_fill(left_gray, refined, c.k,
                                        float(c.threshold))
    return ops.horizontal_fill(left_gray, vfilled, c.k, float(c.threshold))


class ClassicalStereoEngine:
    """Convenience wrapper owning the jitted graph for a fixed config.

    Parity with the reference's ``cuda_depth.StereoMatching`` host object
    (``csrc/depth/stereo_matching.hh:8-33``); the "persistent buffers" are
    XLA's compiled-executable workspace.
    """

    def __init__(self, config: MatchingConfig):
        self.config = config
        fn = functools.partial(compute_disparity_map, config=config)
        self._fn = jax.jit(fn)
        # Batches run the exact single-frame program per frame via lax.map:
        # one 384x1280 frame already fills the chip, and vmap's batching
        # rules for the fused/Pallas stages cost ~2x per frame (measured
        # 0.48-0.79x batch efficiency vs this path's ~1.0).  Results are
        # bit-identical to the single-frame engine.
        self._batched = jax.jit(
            lambda lefts, rights: jax.lax.map(lambda ab: fn(*ab),
                                              (lefts, rights)))

    def compute_disparity_map(self, left_rgb, right_rgb) -> jax.Array:
        """Single (3, H, W) pair -> (H, W) disparity."""
        h, w = left_rgb.shape[-2:]
        if (h, w) != (self.config.height, self.config.width):
            raise ValueError(
                f"engine compiled for {(self.config.height, self.config.width)}, "
                f"got image of shape {(h, w)}")
        return self._fn(jnp.asarray(left_rgb, jnp.float32),
                        jnp.asarray(right_rgb, jnp.float32))

    def compute_disparity_maps(self, left_batch, right_batch) -> jax.Array:
        """Batched (N, 3, H, W) pairs -> (N, H, W) disparities."""
        return self._batched(jnp.asarray(left_batch, jnp.float32),
                             jnp.asarray(right_batch, jnp.float32))

    def warmup(self) -> None:
        """Trigger compilation (the reference warms up CUDA similarly,
        ``right_view_synthesis.py:34-40``)."""
        shape = (3, self.config.height, self.config.width)
        x = jnp.zeros(shape, jnp.float32)
        jax.block_until_ready(self._fn(x, x))
