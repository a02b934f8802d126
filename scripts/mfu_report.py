"""FLOP + MFU accounting for every benched backend (VERDICT r3 #3).

For each backend's per-frame forward graph this compiles the SAME frame
function ``bench.py`` measures and reads XLA's cost analysis off the
compiled executable: ``flops_per_frame`` is the optimized-HLO flop count,
``hbm_bytes_per_frame`` its bytes-accessed estimate.  Compilation runs on
the CPU backend (fast, no tunnel): conv/matmul flop counts are
backend-invariant at the HLO level, and the arithmetic-intensity /
MFU conclusions do not depend on the few-percent differences in
elementwise fusion accounting.  Pallas kernels are custom calls whose
flops XLA cannot see — backends flagged ``contains_pallas`` carry a
hand-count note instead of a misleading zero.

MFU = flops_per_frame * measured_fps / peak_flops, against the TPU v5e
(v5 lite) peak: 197 TFLOP/s bf16.  fp32 arms are reported against the
same bf16 peak (the MXU has no faster fp32 mode — this flatters nothing).

Usage:
    JAX_PLATFORMS=cpu python scripts/mfu_report.py [--fps-record results/bench/bench_full_r03.json]

Writes ``results/bench/mfu_r04.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12


def _analyze(frame_fn, args):
    import jax

    comp = jax.jit(frame_fn).lower(*args).compile()
    ca = comp.cost_analysis()
    return {"flops_per_frame": float(ca.get("flops", 0.0)),
            "hbm_bytes_per_frame": float(ca.get("bytes accessed", 0.0))}


def _backends():
    """Yield (record_key, fps_key, build_fn) — build_fn returns
    (frame_fn, args, meta)."""
    import jax.numpy as jnp
    import numpy as np

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    def classical_kitti():
        cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                             max_disparity=64, impl="xla")
        x = jnp.zeros((3, 384, 1280), jnp.float32)
        return (lambda l, r: compute_disparity_map(l, r, cfg), (x, x),
                {"note": "XLA impl graph; on TPU the same math runs in the "
                         "Pallas kernels (identical flop count by "
                         "construction — bit-equal oracle tests)"})

    def dnn(model_name, dtype, d):
        from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

        backend = DnnStereoMatchingBackend(model_name,
                                           image_shape=(384, 1280),
                                           max_disparity=d,
                                           compute_dtype=dtype)
        x = jnp.zeros((1, 3, 384, 1280), jnp.float32)
        return (lambda l, r: backend._forward(backend.params, l, r),
                (x, x), {})

    def e2e(dtype):
        from stereo_tpu.synthesis.right_view_synthesis import (
            RightViewSynthesis, synthesize_batch)

        cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                             max_disparity=64, impl="xla")
        rvs = RightViewSynthesis(output_shape=(384, 1280),
                                 compute_dtype=dtype)

        def frame(left, variables):
            right = synthesize_batch(rvs.model, variables, left[None],
                                     output_shape=(384, 1280),
                                     full_shape=rvs.model_full_shape,
                                     down_shape=rvs.model_down_shape,
                                     compute_dtype=jnp.dtype(dtype))[0]
            return compute_disparity_map(left, right, cfg)

        x = jnp.zeros((3, 384, 1280), jnp.float32)
        return frame, (x, rvs.variables), {
            "note": "one-graph composition (XLA impl); the TPU path runs "
                    "the same math split across net/blend/matcher "
                    "executables"}

    yield ("classical_kitti", "value", classical_kitti)
    yield ("gwcnet_fps", "gwcnet_fps", lambda: dnn("gwcnet", "float32", 192))
    yield ("gwcnet_bf16_fps", "gwcnet_bf16_fps",
           lambda: dnn("gwcnet", "bfloat16", 192))
    yield ("msnet3d_fps", "msnet3d_fps", lambda: dnn("msnet3d", "float32", 192))
    yield ("msnet3d_bf16_fps", "msnet3d_bf16_fps",
           lambda: dnn("msnet3d", "bfloat16", 192))
    yield ("msnet2d_fps", "msnet2d_fps", lambda: dnn("msnet2d", "float32", 64))
    yield ("e2e_single_view_fps", "e2e_single_view_fps",
           lambda: e2e("float32"))
    yield ("e2e_single_view_bf16_fps", "e2e_single_view_bf16_fps",
           lambda: e2e("bfloat16"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fps-record",
                        default="results/bench/bench_full_r03.json")
    parser.add_argument("--out", default="results/bench/mfu_r04.json")
    args = parser.parse_args()

    import jax
    if jax.default_backend() != "cpu":
        raise SystemExit("run with JAX_PLATFORMS=cpu (CPU compile only)")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.fps_record)) as f:
        fps_record = json.load(f)

    entries = {}
    for key, fps_key, build in _backends():
        try:
            frame_fn, fargs, meta = build()
            entry = _analyze(frame_fn, fargs)
            entry.update(meta)
        except Exception as exc:   # noqa: BLE001 — record the failure
            entries[key] = {"error": str(exc)[:200]}
            print(f"{key}: FAILED {exc}", file=sys.stderr)
            continue
        fps = fps_record.get(fps_key)
        if fps:
            entry["fps"] = fps
            entry["mfu_vs_bf16_peak"] = (entry["flops_per_frame"] * fps
                                         / V5E_PEAK_BF16)
            entry["hbm_GBps_at_fps"] = (entry["hbm_bytes_per_frame"] * fps
                                        / 1e9)
        entries[key] = entry
        print(f"{key}: {entry['flops_per_frame'] / 1e9:.2f} GFLOP/frame, "
              f"mfu={entry.get('mfu_vs_bf16_peak', float('nan')):.5f}",
              flush=True)

    out = {
        "method": "XLA cost analysis of the CPU-compiled per-frame graph "
                  "(optimized HLO flop count; backend-invariant for "
                  "conv/matmul); MFU = flops*fps/peak",
        "peak_assumed": {"chip": "TPU v5e (v5 lite)",
                         "bf16_flops": V5E_PEAK_BF16,
                         "fp32_note": "fp32 arms measured against the same "
                                      "bf16 peak (no faster fp32 mode)"},
        "fps_source": args.fps_record,
        "backends": entries,
    }
    path = os.path.join(root, args.out)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
