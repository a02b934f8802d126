"""Scaling-efficiency harness for the sharded classical engine.

Measures batch throughput of ``ShardedClassicalEngine`` over growing device
counts (BASELINE.md target: >= 80% frames/s scaling efficiency chip -> host
-> pod).  On this single-chip box it runs on virtual CPU devices to
exercise the collective paths; on a real slice run it as-is (the mesh picks
up all visible devices).

Usage::

    # virtual 8-device demo (CPU)
    env -u PYTHONPATH JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --height 128 --width 256

    # real slice
    python scripts/bench_scaling.py --height 384 --width 1280
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from stereo_tpu.core.config import MatchingConfig, MeshConfig
from stereo_tpu.parallel import ShardedClassicalEngine


def mesh_layouts(n):
    """Per device count: (data, tile, disp) preferring collective axes."""
    layouts = {1: (1, 1, 1), 2: (1, 2, 1), 4: (1, 2, 2), 8: (2, 2, 2),
               16: (4, 2, 2), 32: (8, 2, 2)}
    return layouts.get(n)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--max-disparity", type=int, default=15)
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    n_devices = len(jax.devices())
    rng = np.random.default_rng(0)
    results = {}
    base_fps = None

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    for n in counts:
        layout = mesh_layouts(n)
        if layout is None:
            continue
        data, tile, disp = layout
        cfg = MatchingConfig(
            height=args.height, width=args.width, downscale_factor=2,
            min_disparity=0, max_disparity=args.max_disparity,
            cost_patch_radius=1, sad_patch_radius=2, threshold=5,
            small_mbm_radius=1, mid_mbm_radius=1, large_mbm_radius=2)
        engine = ShardedClassicalEngine(cfg, MeshConfig(data, tile, disp))
        batch = max(args.frames - args.frames % data, data)
        left = rng.integers(0, 256, (batch, 3, args.height,
                                     args.width)).astype(np.float32)
        right = np.roll(left, -4, axis=-1)
        out = jax.block_until_ready(
            engine.compute_disparity_maps(left, right))     # compile
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = jax.block_until_ready(
                engine.compute_disparity_maps(left, right))
            best = min(best, time.perf_counter() - t0)
        fps = batch / best
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        results[n] = {"layout": layout, "fps": round(fps, 2),
                      "efficiency_vs_1dev": round(eff, 3)}
        print(f"{n} devices {layout}: {fps:.1f} frames/s "
              f"(efficiency {eff:.2f})")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
