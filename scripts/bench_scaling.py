"""Scaling-efficiency harness (BASELINE.md target: >= 80% frames/s scaling
efficiency chip -> host -> pod).

Two modes, because this box has ONE real TPU chip:

* ``--mode mesh`` (default off-TPU): throughput of ``ShardedClassicalEngine``
  over growing device counts.  On virtual CPU devices the numbers measure
  *communication/sharding overhead shape only* — virtual devices share the
  same physical cores, so "efficiency" is not chip-scaling evidence; on a
  real slice the same command measures true scaling.
* ``--mode batch`` (default on-TPU): single-chip weak scaling — frames/s of
  the vmapped engine at growing batch sizes.  This is the per-chip half of
  the scaling story the driver can actually capture here.

Every repeat perturbs the input batch by a tiny on-device epsilon first:
the TPU tunnel memoizes value-identical dispatches, so timing an unmodified
repeat would measure the cache, not the device
(see ``bench.py``'s marginal protocol for the headline numbers).

Usage::

    # virtual 8-device mesh (CPU)
    env -u PYTHONPATH JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --mode mesh --height 128 --width 256

    # real chip: batch scaling at the KITTI config
    python scripts/bench_scaling.py --mode batch --height 384 --width 1280 \
        --max-disparity 64

Writes the JSON to ``results/scaling/`` (committed as the scaling record).
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

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()   # tunnel compiles are slow; share bench.py's cache

from stereo_tpu.core.config import MatchingConfig, MeshConfig
from stereo_tpu.matching.classical import ClassicalStereoEngine
from stereo_tpu.parallel import ShardedClassicalEngine


def mesh_layouts(n):
    """Per device count: (data, tile, disp) preferring collective axes."""
    layouts = {1: (1, 1, 1), 2: (1, 2, 1), 4: (1, 2, 2), 8: (2, 2, 2),
               16: (4, 2, 2), 32: (8, 2, 2)}
    return layouts.get(n)


def _timed_fps(fn, left, right, batch, repeats, m_small=4, m_large=16):
    """Marginal-cost throughput (bench.py protocol): one executable per M
    runs the engine M times in-graph over *distinct* inputs (``+ i*1e-38``)
    and reduces everything to one scalar readback.  The tunnel memoizes
    value-identical dispatches, elides unconsumed outputs, and returns from
    ``block_until_ready`` before remote compute drains — so wall-timing
    individual dispatches measures the RPC, not the device.  The marginal
    time between M_small and M_large differences all of that out.

    ``fn`` must be a jit-traceable callable over already-placed arrays
    (the engine's jitted graph is fine — it inlines under the outer jit).
    ``m_small``/``m_large`` are per-call trip counts; callers scale them so
    ``m_large * batch`` covers enough frames (>=64 at the headline config's
    ~1.5 ms/frame) that the marginal slope is noise-free.
    """
    import jax.numpy as jnp
    from jax import lax

    def make_runner(m):
        @jax.jit
        def run_m(seed, l, r):
            def one(i):
                return jnp.sum(fn(l + (seed + i) * 1e-38, r))
            return jnp.sum(lax.map(one, jnp.arange(m, dtype=jnp.float32)))
        return run_m

    run_small, run_large = make_runner(m_small), make_runner(m_large)
    jax.block_until_ready(run_small(jnp.float32(1.0), left, right))  # compile
    jax.block_until_ready(run_large(jnp.float32(2.0), left, right))

    def timed(run, seed):
        t0 = time.perf_counter()
        float(run(jnp.float32(seed), left, right))
        return time.perf_counter() - t0

    seed = 3.0
    t_small = t_large = float("inf")
    for _ in range(max(repeats, 2)):
        t_small = min(t_small, timed(run_small, seed))
        t_large = min(t_large, timed(run_large, seed + 1))
        seed += 2
    slope = max((t_large - t_small) / (m_large - m_small), 1e-9)
    return batch / slope


_PRESETS = {
    # The headline config: identical radii to bench.py's KITTI metric (the
    # MatchingConfig defaults), so the scaling record's absolute FPS is
    # directly comparable to BENCH_r*.json.
    "headline": dict(cost_patch_radius=1, sad_patch_radius=5,
                     small_mbm_radius=1, mid_mbm_radius=4,
                     large_mbm_radius=10),
    # Light radii for virtual-CPU mesh runs (full radii are impractically
    # slow off-TPU; mesh mode measures collective overhead shape only).
    "light": dict(cost_patch_radius=1, sad_patch_radius=2,
                  small_mbm_radius=1, mid_mbm_radius=1, large_mbm_radius=2),
}


def _make_config(args):
    return MatchingConfig(
        height=args.height, width=args.width, downscale_factor=2,
        min_disparity=0, max_disparity=args.max_disparity, threshold=5,
        **_PRESETS[args.preset])


def run_mesh_mode(args) -> dict:
    n_devices = len(jax.devices())
    rng = np.random.default_rng(0)
    results = {}
    base_fps = None
    for n in (1, 2, 4, 8, 16, 32):
        if n > n_devices or mesh_layouts(n) is None:
            continue
        data, tile, disp = mesh_layouts(n)
        engine = ShardedClassicalEngine(_make_config(args),
                                        MeshConfig(data, tile, disp))
        batch = max(args.frames - args.frames % data, data)
        left = rng.integers(0, 256, (batch, 3, args.height,
                                     args.width)).astype(np.float32)
        right = np.roll(left, -4, axis=-1)
        from jax.sharding import NamedSharding, PartitionSpec as P
        import jax.numpy as jnp
        sharding = NamedSharding(engine.mesh, P("data", None, "tile", None))
        ld = jax.device_put(jnp.asarray(left), sharding)
        rd = jax.device_put(jnp.asarray(right), sharding)
        fps = _timed_fps(engine._fn, ld, rd, batch, args.repeats)
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        results[str(n)] = {"layout": [data, tile, disp],
                           "fps": round(fps, 2),
                           "efficiency_vs_1dev": round(eff, 3)}
        print(f"{n} devices ({data},{tile},{disp}): {fps:.1f} frames/s "
              f"(efficiency {eff:.2f})")
    return results


def run_batch_mode(args) -> dict:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    engine = ClassicalStereoEngine(_make_config(args))
    results = {}
    base_fps = None
    for batch in (1, 2, 4, 8, 16, 32):
        left = rng.integers(0, 256, (batch, 3, args.height,
                                     args.width)).astype(np.float32)
        right = np.roll(left, -4, axis=-1)
        fps = _timed_fps(engine._batched, jnp.asarray(left),
                         jnp.asarray(right), batch, args.repeats,
                         m_small=max(2, 16 // batch),
                         m_large=max(8, 64 // batch))
        if base_fps is None:
            base_fps = fps
        results[str(batch)] = {"fps": round(fps, 2),
                               "per_frame_ms": round(1000 * batch / fps /
                                                     batch, 3),
                               "vs_batch1": round(fps / base_fps, 3)}
        print(f"batch {batch}: {fps:.1f} frames/s "
              f"({fps / base_fps:.2f}x batch-1)")
    return results


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["mesh", "batch"],
                        default=("batch" if jax.default_backend() == "tpu"
                                 else "mesh"))
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--max-disparity", type=int, default=15)
    parser.add_argument("--preset", choices=sorted(_PRESETS),
                        default=("headline"
                                 if jax.default_backend() == "tpu"
                                 else "light"),
                        help="matching radii: 'headline' = bench.py's KITTI "
                             "config (default on TPU), 'light' = small radii "
                             "for virtual-CPU mesh runs")
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--output-dir", default="results/scaling")
    args = parser.parse_args()

    meta = {"mode": args.mode, "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "virtual_devices": jax.default_backend() != "tpu",
            "config": {"height": args.height, "width": args.width,
                       "max_disparity": args.max_disparity,
                       "preset": args.preset, **_PRESETS[args.preset]}}
    if args.mode == "mesh":
        meta["results"] = run_mesh_mode(args)
        if meta["virtual_devices"]:
            meta["note"] = ("virtual CPU devices share physical cores: "
                            "numbers exercise the collective paths, not "
                            "chip scaling")
    else:
        meta["results"] = run_batch_mode(args)
        meta["note"] = "single-chip weak scaling over batch size"

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, f"scaling_{args.mode}_"
                       f"{meta['backend']}.json")
    with open(out, "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
