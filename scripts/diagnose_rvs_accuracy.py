"""Decompose the single-view (rvs_on) accuracy gap (VERDICT r4 ask #1).

The committed checkpoint sits at rvs_on D1 0.29-0.48 vs a floor of
0.002-0.068 (``results/evaluation/single_view_floor_r04.json``).  This
script isolates WHERE the gap lives, with a transfer-minimal protocol
(tunnel weather makes host<->device bytes the scarce resource): scene
generation, the Deep3D forward, and every statistic run inside ONE jitted
graph; only scalars come back per scene.

Stage 1 (default) — probability-volume statistics on the canonical eval
scenes:
  soft-argmax error vs exact right-frame GT   (geometry, sub-pixel)
  hard-argmax error                           (geometry, mode only)
  peak probability mass                       (diffuseness / ghosting)
  photometric L1 vs true right / vs oracle    (synthesis quality)
If hard-argmax is accurate while soft-argmax / peak are poor, the volume's
mode is right and BLEND GHOSTING drives the gap (train sharper: ce weight,
or sharpen at inference).  If hard-argmax is off too, the predicted
geometry itself is wrong (train longer/stronger supervision).

Stage 2 (``--ladder``) — matcher D1 on a ladder of synthesized views:
  synth (committed output) -> sharp(T) -> warp(pred) -> warp(gt)=oracle,
run through in-graph matching (classical engine / gwcnet), metrics masked
to 0 < gt <= 64, one scalar set per scene per rung.

Usage: python scripts/diagnose_rvs_accuracy.py [--ladder] [--backends ...]
"""

from __future__ import annotations

import argparse
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


def warp_by_disparity(left_chw, d_right):
    """right[c, x, y] = left[c, x, y + d(x, y)] (bilinear, in-graph)."""
    c, h, w = left_chw.shape
    y = jnp.arange(w, dtype=jnp.float32)[None, :] + d_right
    y0 = jnp.floor(y)
    frac = y - y0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, w - 1)
    rows = jnp.arange(h)[:, None]
    return ((1.0 - frac)[None] * left_chw[:, rows, y0i]
            + frac[None] * left_chw[:, rows, y1i])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ladder", action="store_true")
    parser.add_argument("--backends", nargs="+", default=["gwcnet"])
    parser.add_argument("--temps", nargs="+", type=float, default=[4.0])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", default="results/evaluation/"
                                         "rvs_diagnosis_r05.json",
                        help="record path (default documents the COMMITTED "
                             "checkpoint; pass another path when diagnosing "
                             "a candidate so the committed before-record "
                             "isn't clobbered)")
    args = parser.parse_args()

    from stereo_tpu.models import Deep3D
    from stereo_tpu.synthesis.right_view_synthesis import RightViewSynthesis
    from stereo_tpu.train.synthetic import synthetic_stereo_scene

    rvs = RightViewSynthesis(checkpoint_dir=args.checkpoint,
                             ff_weights_dtype="float32")
    model = rvs.model
    variables = jax.device_put(rvs.variables)   # upload ONCE, pass as arg
    channels = jnp.arange(65, dtype=jnp.float32)

    def scene(key):
        return synthetic_stereo_scene(key, H, W, 6.0, 58.0, 6, True, True)

    def forward(variables, left):
        full = left[None] / 255.0
        down = jax.image.resize(full, (1, 3, H // 4, W // 4),
                                method="bilinear")
        pred, prob = model.apply(
            variables, full, down, train=False,
            method=Deep3D.synthesize_with_probabilities)
        return pred[0] * 255.0, prob[0]          # (3,H,W), (65,H,W)

    @jax.jit
    def stats_one(variables, key):
        left, right, gt, gt_right = scene(key)
        synth, prob = forward(variables, left)
        exp_d = jnp.einsum("dhw,d->hw", prob, channels)
        hard_d = jnp.argmax(prob, axis=0).astype(jnp.float32)
        peak = prob.max(axis=0)
        oracle = warp_by_disparity(left, gt_right)
        err_s = jnp.abs(exp_d - gt_right)
        err_h = jnp.abs(hard_d - gt_right)
        return {
            "soft_mae": err_s.mean(), "soft_gt1": (err_s > 1).mean(),
            "soft_gt3": (err_s > 3).mean(),
            "hard_mae": err_h.mean(), "hard_gt1": (err_h > 1).mean(),
            "hard_gt3": (err_h > 3).mean(),
            "peak_mean": peak.mean(),
            "peak_p10": jnp.percentile(peak, 10),
            "photo_synth_vs_right": jnp.abs(synth - right).mean(),
            "photo_synth_vs_oracle": jnp.abs(synth - oracle).mean(),
            "photo_oracle_vs_right": jnp.abs(oracle - right).mean(),
        }

    keys = [jax.random.fold_in(jax.random.PRNGKey(SEED), i)
            for i in range(N_FRAMES)]
    acc = {}
    for i, key in enumerate(keys):
        out = jax.device_get(stats_one(variables, key))
        for k, v in out.items():
            acc.setdefault(k, []).append(float(v))
        print(f"scene {i}: soft_mae {out['soft_mae']:.3f} "
              f"hard_mae {out['hard_mae']:.3f} peak {out['peak_mean']:.3f}",
              flush=True)
    summary = {k: float(np.mean(v)) for k, v in acc.items()}
    print("== probability-volume statistics (mean over scenes) ==")
    for k, v in summary.items():
        print(f"  {k}: {v:.4f}")

    record = {"volume_stats": summary}

    if args.ladder:
        from stereo_tpu.core.config import MatchingConfig
        from stereo_tpu.matching.classical import compute_disparity_map
        from stereo_tpu.ops.shift_stack import weighted_shift_sum
        from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

        cfg = MatchingConfig(height=H, width=W, min_disparity=0,
                             max_disparity=64)
        backends = {}
        for name in args.backends:
            if name == "classical":
                backends[name] = None
            else:
                backends[name] = DnnStereoMatchingBackend(
                    name, image_shape=(H, W), max_disparity=64)

        def metrics(disp, gt):
            mask = (gt > 0) & (gt <= 64)
            err = jnp.abs(disp - gt)
            denom = jnp.maximum(mask.sum(), 1)
            d1 = ((err > 3.0) & (err > 0.05 * gt) & mask).sum() / denom
            t1 = ((err > 1.0) & mask).sum() / denom
            mae = jnp.where(mask, err, 0.0).sum() / denom
            return {"D1": d1, "T1": t1, "MAE": mae}

        temp = float(args.temps[0])          # static: baked into the jit

        def rungs(variables, key):
            left, right, gt, gt_right = scene(key)
            synth, prob = forward(variables, left)
            exp_d = jnp.einsum("dhw,d->hw", prob, channels)
            p = prob ** temp
            p = p / p.sum(axis=0, keepdims=True)
            sharp = weighted_shift_sum(p[None], left[None] / 255.0)[0] * 255.0
            views = {"synth": synth,
                     f"sharp_T{temp:g}": sharp,
                     "warp_pred": warp_by_disparity(left, exp_d),
                     "warp_gt": warp_by_disparity(left, gt_right)}
            return views, left, gt

        ladder = {}
        for name, backend in backends.items():
            if backend is None:
                def match(l, r):
                    return compute_disparity_map(l, r, cfg)
            else:
                def match(l, r, _b=backend):
                    return _b._forward(_b.params, l[None], r[None])[0]

            @jax.jit
            def ladder_one(variables, key):
                views, left, gt = rungs(variables, key)
                return {vn: metrics(match(left, v), gt)
                        for vn, v in views.items()}

            rows = {}
            for i, key in enumerate(keys):
                out = jax.device_get(ladder_one(variables, key))
                for vn, ms in out.items():
                    rows.setdefault(vn, {m: [] for m in ms})
                    for m, v in ms.items():
                        rows[vn][m].append(float(v))
                print(f"[{name}] scene {i}: "
                      + "  ".join(f"{vn} D1={np.mean(rows[vn]['D1']):.4f}"
                                  for vn in rows), flush=True)
            ladder[name] = {vn: {m: float(np.mean(v)) for m, v in ms.items()}
                            for vn, ms in rows.items()}
            print(f"== {name} D1 ladder ==")
            for vn, ms in ladder[name].items():
                print(f"  {vn:12s} D1 {ms['D1']:.4f}  T1 {ms['T1']:.4f}  "
                      f"MAE {ms['MAE']:.3f}")
        record["ladder"] = ladder

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
