"""Quantify the single-view (rvs_on) accuracy FLOOR (VERDICT r3 #5).

Deep3D's view-synthesis head can only emit convex combinations of
horizontally shifted left-view pixels (``deep3d.py:169-183`` in the
reference; ``ops.weighted_shift_sum`` here).  The best right view
REACHABLE by that whole architecture class is therefore the left view
warped by the TRUE right-frame disparity — per output pixel, put all
probability mass on the correct (fractional -> two-tap) shift.  Running
each stereo backend on that ORACLE synthesis gives a per-backend lower
bound on rvs_on error that no amount of Deep3D training can beat; the
residual oracle error itself isolates the fundamentally unpredictable
part (occluded-in-left content that the warp necessarily fills with the
occluder's texture).

Same protocol as the committed evaluation (``results/evaluation/
evaluation_r04_native_protocol.json``): held-out depth-prior scenes, seed
20260817, 8 frames at the native 384x1280 operating point, metrics masked
to ``0 < gt <= 64``.

Writes ``results/evaluation/single_view_floor_r05.json`` (``--out``) with
(floor, current, gap) per backend.

Usage: python scripts/single_view_floor.py   (TPU; CPU works too)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

SEED = 20260817
N_FRAMES = 8
H, W = 384, 1280


def oracle_right_view(left_chw: jnp.ndarray, d_right: jnp.ndarray):
    """Bilinear warp: oracle_right[c, x, y] = left[c, x, y + d_r(x, y)] —
    the reachable optimum of the shift-blend synthesis family (fractional
    disparities = the two-tap convex blend the softmax head could emit)."""
    c, h, w = left_chw.shape
    y = jnp.arange(w, dtype=jnp.float32)[None, :] + d_right      # (H, W)
    y0 = jnp.floor(y)
    frac = y - y0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, w - 1)
    rows = jnp.arange(h)[:, None]
    take = lambda idx: left_chw[:, rows, idx]                    # noqa: E731
    return (1.0 - frac)[None] * take(y0i) + frac[None] * take(y1i)


def scenes():
    from stereo_tpu.train.synthetic import synthetic_stereo_scene

    gen = jax.jit(synthetic_stereo_scene, static_argnums=(1, 2, 5, 6, 7))
    for i in range(N_FRAMES):
        key = jax.random.fold_in(jax.random.PRNGKey(SEED), i)
        left, right, gt, gt_right = gen(key, H, W, 6.0, 58.0, 6, True, True)
        yield (np.asarray(left), np.asarray(right), np.asarray(gt),
               np.asarray(gt_right))


def main() -> None:
    import argparse

    from stereo_tpu.core.config import PipelineConfig
    from stereo_tpu.pipeline import DepthEstimationPipeline
    from stereo_tpu.pipeline.metrics import default_metrics
    from stereo_tpu.pipeline.runner import reduce_metrics

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--current-record",
        default="results/evaluation/evaluation_r05_native_protocol.json",
        help="the committed rvs_on eval the gap is computed against")
    parser.add_argument(
        "--out", default="results/evaluation/single_view_floor_r05.json")
    args = parser.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.current_record)) as f:
        current = json.load(f)

    backends = ["classical", "gwcnet", "msnet3d", "msnet2d"]
    cached = [s for s in scenes()]
    oracle_l1 = float(np.mean([np.abs(
        np.asarray(oracle_right_view(jnp.asarray(l), jnp.asarray(gr))) - r)
        for (l, r, _, gr) in cached]))
    print(f"oracle synthesis L1 vs true right: {oracle_l1:.3f} gray levels "
          f"(the occlusion-driven unpredictable part)")

    out = {"note": "floor = each backend on the ORACLE right view (left "
                   "warped by true right-frame disparity — the reachable "
                   "optimum of the shift-blend synthesis class); current = "
                   "committed rvs_on eval; gap = current - floor is the "
                   "training-closable part",
           "protocol": {"seed": SEED, "n_frames": N_FRAMES,
                        "image_shape": [H, W], "scene_family": "depth_prior",
                        "mask": "0 < gt <= 64"},
           "oracle_synthesis_L1_gray_levels": round(oracle_l1, 3),
           "backends": {}}

    for backend in backends:
        config = PipelineConfig(image_shape=(H, W), min_disparity=0,
                                max_disparity=64,
                                stereo_matching_backend=backend)
        pipeline = DepthEstimationPipeline(config)
        metrics = default_metrics()
        results = {m.name(): [] for m in metrics}
        for (left, right, gt, gt_right) in cached:
            oracle = np.asarray(oracle_right_view(jnp.asarray(left),
                                                  jnp.asarray(gt_right)))
            output = pipeline.process(left, oracle)
            mask = (gt <= 64) & (gt > 0)
            for m in metrics:
                results[m.name()].append(m.process(output.disparity_map, gt,
                                                   mask))
        floor = reduce_metrics(results, "mean")
        cur = current.get(f"synthetic/rvs_on/{backend}", {})
        entry = {"floor": floor, "current_rvs_on": cur}
        if "D1" in cur:
            entry["d1_floor"] = round(floor["D1"], 4)
            entry["d1_current"] = round(cur["D1"], 4)
            entry["d1_gap_training_closable"] = round(cur["D1"] - floor["D1"],
                                                      4)
        out["backends"][backend] = entry
        print(f"{backend}: D1 floor {floor['D1']:.4f}  current "
              f"{cur.get('D1', float('nan')):.4f}", flush=True)

    path = os.path.join(root, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
