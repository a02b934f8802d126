"""Stage-level marginal timing of the classical engine at a given config.

Dev tool (not part of bench.py's driver contract): times cumulative pipeline
prefixes with the marginal protocol so per-stage cost = difference between
consecutive prefixes.  Run on the real TPU; results guide fusion work.

Usage::

    python scripts/profile_classical.py            # KITTI config
    python scripts/profile_classical.py --middlebury
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: marginal protocol + compile cache
import numpy as np

bench._enable_compile_cache()

import jax
import jax.numpy as jnp

from stereo_tpu.core.config import MatchingConfig
from stereo_tpu import ops
from stereo_tpu.ops.pallas import kernels as pk
from stereo_tpu.ops.refinement import refine_from_window


def variants(c: MatchingConfig):
    def pooled(l, r):
        lg = ops.rgb_to_grayscale(l)
        rg = ops.rgb_to_grayscale(r)
        return lg, rg, ops.mean_pool(lg, c.k), ops.mean_pool(rg, c.k)

    def v_pool(l, r):
        lg, rg, ld, rd = pooled(l, r)
        return ld + rd

    def v_core(l, r):
        _, _, ld, rd = pooled(l, r)
        disp, mbm = pk.matching_core(ld, rd, c)
        return jnp.sum(disp) + jnp.sum(mbm)

    def v_window(l, r):
        lg, rg, ld, rd = pooled(l, r)
        disp, mbm = pk.matching_core(ld, rd, c)
        win = pk.sampled_window(lg, rg, disp, c)
        return jnp.sum(win) + jnp.sum(mbm)

    def v_refine(l, r):
        lg, rg, ld, rd = pooled(l, r)
        disp, mbm = pk.matching_core(ld, rd, c)
        win = pk.sampled_window(lg, rg, disp, c)
        return refine_from_window(jnp.moveaxis(win, 0, -1), disp,
                                  mbm[0], mbm[1], mbm[2], c.k)

    def v_pallas_full(l, r):
        from stereo_tpu.matching.classical import compute_disparity_map
        return compute_disparity_map(
            l, r, c.replace(impl="pallas"))

    def v_xla_full(l, r):
        from stereo_tpu.matching.classical import compute_disparity_map
        return compute_disparity_map(l, r, c.replace(impl="xla"))

    def v_xla_wta(l, r):
        lg, rg, ld, rd = pooled(l, r)
        vol = ops.sad_cost_volume(ld, rd, c.min_disparity_down,
                                  c.max_disparity_down, c.cost_patch_radius)
        agg = ops.mbm_aggregate(vol, c.small_mbm_radius, c.mid_mbm_radius,
                                c.large_mbm_radius)
        return ops.wta_disparity(agg, c.min_disparity_down)

    def v_xla_refine(l, r):
        lg, rg, ld, rd = pooled(l, r)
        vol = ops.sad_cost_volume(ld, rd, c.min_disparity_down,
                                  c.max_disparity_down, c.cost_patch_radius)
        agg = ops.mbm_aggregate(vol, c.small_mbm_radius, c.mid_mbm_radius,
                                c.large_mbm_radius)
        disp = ops.wta_disparity(agg, c.min_disparity_down)
        return ops.secondary_matching(lg, rg, agg, disp, c.k,
                                      c.sad_patch_radius,
                                      c.min_disparity_down)

    return [("pool", v_pool), ("pallas_core", v_core),
            ("pallas_window", v_window), ("pallas_refine", v_refine),
            ("pallas_full", v_pallas_full),
            ("xla_wta", v_xla_wta), ("xla_refine", v_xla_refine),
            ("xla_full", v_xla_full)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--middlebury", action="store_true")
    p.add_argument("--m-small", type=int, default=6)
    p.add_argument("--m-large", type=int, default=30)
    p.add_argument("--only", default=None, help="comma list of variant names")
    args = p.parse_args()

    if args.middlebury:
        c = MatchingConfig()
    else:
        c = MatchingConfig(height=384, width=1280, min_disparity=0,
                           max_disparity=64)
    rng = np.random.default_rng(0)
    left = np.round(rng.uniform(0, 255, (3, c.height, c.width))
                    ).astype(np.float32)
    right = np.roll(left, -11, axis=-1)
    ld = jax.device_put(jnp.asarray(left))
    rd = jax.device_put(jnp.asarray(right))

    only = set(args.only.split(",")) if args.only else None
    for name, fn in variants(c):
        if only and name not in only:
            continue
        wrapped = lambda l, r, f=fn: jnp.sum(f(l, r))
        fps, fixed_ms, _ = bench._marginal_fps(
            wrapped, (ld, rd), m_small=args.m_small, m_large=args.m_large)
        print(f"{name:16s} {1000.0 / fps:8.3f} ms/frame  "
              f"({fps:8.1f} fps, fixed {fixed_ms:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
