"""FLOP + MFU accounting for every benched backend (VERDICT r3 #3, r4 #4).

Two separately-labeled measurement planes — the r4 record mixed them and
produced physically impossible HBM figures (12-25 TB/s on an ~819 GB/s
chip), because XLA cost-analysis bytes of the CPU-compiled *XLA-impl*
graph were multiplied by FPS measured on the *Pallas* executables whose
entire design avoids those HBM round-trips:

1. ``flops_per_frame`` — XLA cost analysis of the CPU-compiled XLA-impl
   graph.  Conv/matmul flop counts are backend-invariant at the HLO level,
   and the Pallas kernels compute the same math (bit-equal oracle tests),
   so this number describes every implementation of the stage.  MFU =
   flops * measured_fps / peak.
2. HBM traffic — reported ONLY for the executable the FPS was measured
   on: ``tpu_exec_hbm_bytes_per_frame`` is the TPU compiler's
   bytes-accessed estimate of the ACTUAL deployed executable(s) (the
   Pallas-impl classical graph; the split net+blend+matcher chain for
   e2e; the TPU-compiled XLA graph for the DNN backends), summed over
   the chain.  ``io_bytes_floor_per_frame`` is the indisputable lower
   bound (executable inputs + outputs only).  Rows carry
   ``hbm_GBps_at_fps`` / ``pct_of_v5e_hbm_bw`` derived from the TPU
   executable's bytes — never from the CPU graph.

TPU compilation of the measured executables happens only when a TPU
backend is present (``--tpu-bytes off`` to skip; msnet3d is skipped by
default — its remote compile alone runs >10 min, pass ``--include-slow``).

Usage:
    python scripts/mfu_report.py [--fps-record results/bench/bench_full_r04.json]
    (CPU-only env: JAX_PLATFORMS=cpu -> flops/MFU only, no HBM columns)

Writes ``results/bench/mfu_r05.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9            # bytes/s


def _cost(fn, args, backend):
    import jax

    comp = jax.jit(fn, backend=backend).lower(*args).compile()
    ca = comp.cost_analysis()
    if ca is None:
        return None
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def _io_bytes(args_and_outs):
    """Sum of array sizes (bytes) over example inputs + outputs."""
    import jax
    import numpy as np

    total = 0
    for leaf in jax.tree_util.tree_leaves(args_and_outs):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            total += int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
    return total


def _backends(include_slow: bool):
    """Yield (record_key, fps_key, build) — ``build()`` returns a dict:
    ``cpu_graph``: (fn, args) for the XLA-impl flop count;
    ``tpu_execs``: list of (label, fn, args) — the executables the FPS was
    actually measured on (compiled on TPU for real HBM bytes);
    ``meta``: notes."""
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    kitti = dict(height=384, width=1280, min_disparity=0, max_disparity=64)

    def classical_kitti():
        cfg_x = MatchingConfig(impl="xla", **kitti)
        cfg_p = MatchingConfig(impl="pallas", **kitti)
        x = jnp.zeros((3, 384, 1280), jnp.float32)
        return {
            "cpu_graph": (lambda l, r: compute_disparity_map(l, r, cfg_x),
                          (x, x)),
            "tpu_execs": [("classical_pallas_graph",
                           lambda l, r: compute_disparity_map(l, r, cfg_p),
                           (x, x))],
            "meta": {"note": "flops: XLA-impl graph (same math as the "
                             "Pallas kernels, bit-equal oracle tests); "
                             "bytes: the deployed Pallas-impl executable"},
        }

    def dnn(model_name, dtype, d):
        from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

        backend = DnnStereoMatchingBackend(model_name,
                                           image_shape=(384, 1280),
                                           max_disparity=d,
                                           compute_dtype=dtype)
        x = jnp.zeros((1, 3, 384, 1280), jnp.float32)
        fn = lambda l, r: backend._forward(backend.params, l, r)  # noqa: E731
        return {
            "cpu_graph": (fn, (x, x)),
            "tpu_execs": [(f"{model_name}_{dtype}_xla_graph", fn, (x, x))],
            "meta": {"note": "pure-XLA network: the TPU-compiled graph IS "
                             "the measured executable"},
        }

    def e2e(dtype):
        import jax

        from stereo_tpu.models import Deep3D
        from stereo_tpu.ops.imageops import rescale_generated_view
        from stereo_tpu.pipeline.single_view import FusedSingleViewEngine
        from stereo_tpu.synthesis.right_view_synthesis import (
            RightViewSynthesis, synthesize_net_batch)

        cfg_x = MatchingConfig(impl="xla", **kitti)
        cfg_p = MatchingConfig(impl="pallas", **kitti)
        rvs = RightViewSynthesis(output_shape=(384, 1280),
                                 compute_dtype=dtype)

        def one_graph(left, variables):
            # Explicit (Pallas-free) composition so the flop graph compiles
            # on the CPU backend even when a TPU is the default platform
            # (Deep3D.__call__ would pick the fused Pallas blend there).
            full = left[None] / 255.0
            down = jnp.asarray(jax.image.resize(
                full, (1, 3, 96, 320), method="bilinear"))
            cd = jnp.dtype(dtype)
            variables = jax.tree_util.tree_map(
                lambda t: t.astype(cd) if hasattr(t, "dtype")
                and t.dtype == jnp.float32 else t, variables)
            right, _ = rvs.model.apply(
                variables, full.astype(cd), down.astype(cd), train=False,
                method=Deep3D.synthesize_with_probabilities)
            right = rescale_generated_view(right[0].astype(jnp.float32))
            return compute_disparity_map(left, right, cfg_x)

        x = jnp.zeros((3, 384, 1280), jnp.float32)
        execs = [("deep3d_net",
                  lambda v, l: synthesize_net_batch(
                      rvs.model, v, l, full_shape=rvs.model_full_shape,
                      down_shape=rvs.model_down_shape,
                      compute_dtype=jnp.dtype(dtype)),
                  (rvs.variables, x[None]))]
        import jax
        if jax.default_backend() == "tpu":
            engine = FusedSingleViewEngine(cfg_p, rvs)
            prob_low, full01 = jax.eval_shape(
                lambda v, l: synthesize_net_batch(
                    rvs.model, v, l, full_shape=rvs.model_full_shape,
                    down_shape=rvs.model_down_shape,
                    compute_dtype=jnp.dtype(dtype)),
                rvs.variables, x[None])
            pl = jnp.zeros(prob_low.shape, prob_low.dtype)
            fu = jnp.zeros(full01.shape, full01.dtype)
            execs.append(("blend_tail_plus_matcher",
                          engine._fn_tail_match, (pl, fu, x[None])))
        return {
            "cpu_graph": (one_graph, (x, rvs.variables)),
            "tpu_execs": execs,
            "meta": {"note": "flops: one-graph XLA-impl composition; "
                             "bytes: the deployed two-executable chain "
                             "(Deep3D net + merged Pallas blend/matcher), "
                             "summed"},
        }

    yield ("classical_kitti", "value", classical_kitti)
    yield ("gwcnet_fps", "gwcnet_fps", lambda: dnn("gwcnet", "float32", 192))
    yield ("gwcnet_bf16_fps", "gwcnet_bf16_fps",
           lambda: dnn("gwcnet", "bfloat16", 192))
    if include_slow:
        yield ("msnet3d_fps", "msnet3d_fps",
               lambda: dnn("msnet3d", "float32", 192))
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
                        default="results/bench/bench_full_r04.json")
    parser.add_argument("--out", default="results/bench/mfu_r05.json")
    parser.add_argument("--tpu-bytes", choices=["auto", "off"],
                        default="auto")
    parser.add_argument("--include-slow", action="store_true",
                        help="also TPU-compile msnet3d (remote compile "
                             ">10 min)")
    args = parser.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu" and args.tpu_bytes == "auto"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.fps_record)) as f:
        fps_record = json.load(f)

    entries = {}
    # msnet3d flops are cheap on CPU even when TPU-compiling it is not.
    for key, fps_key, build in _backends(include_slow=True):
        try:
            spec = build()
            fn, fargs = spec["cpu_graph"]
            cpu = _cost(fn, fargs, backend="cpu")
            entry = {"flops_per_frame": cpu["flops"],
                     "flops_source": "CPU-compiled XLA-impl graph "
                                     "(backend-invariant conv/matmul "
                                     "counts)"}
            entry.update(spec["meta"])
        except Exception as exc:   # noqa: BLE001 — record the failure
            entries[key] = {"error": str(exc)[:200]}
            print(f"{key}: FAILED {exc}", file=sys.stderr)
            continue
        fps = fps_record.get(fps_key)
        if fps:
            entry["fps"] = fps
            entry["fps_source"] = args.fps_record
            entry["mfu_vs_bf16_peak"] = (entry["flops_per_frame"] * fps
                                         / V5E_PEAK_BF16)
        slow_row = key.startswith("msnet3d")
        if on_tpu and (not slow_row or args.include_slow):
            execs, total_bytes, io_floor = [], 0.0, 0
            try:
                for label, tfn, targs in spec["tpu_execs"]:
                    out_shape = jax.eval_shape(tfn, *targs)
                    tpu = _cost(tfn, targs, backend="tpu")
                    if tpu is None:
                        raise RuntimeError("cost_analysis unavailable on "
                                           "this TPU runtime")
                    execs.append({"executable": label,
                                  "hbm_bytes": tpu["bytes"]})
                    total_bytes += tpu["bytes"]
                    io_floor += _io_bytes((targs, out_shape))
                entry["tpu_execs"] = execs
                entry["tpu_exec_hbm_bytes_per_frame"] = total_bytes
                entry["io_bytes_floor_per_frame"] = io_floor
                if fps:
                    gbps = total_bytes * fps / 1e9
                    entry["hbm_GBps_at_fps"] = gbps
                    pct = 100.0 * gbps * 1e9 / V5E_HBM_BW
                    entry["pct_of_v5e_hbm_bw"] = round(pct, 2)
                    # The compiler's bytes-accessed is an UPPER BOUND on
                    # real traffic (it counts fused operands that may never
                    # leave VMEM).  Well over the physical roof => the
                    # overcount dominates and the row is inconclusive.
                    if pct > 110.0:
                        entry["bound"] = (
                            "inconclusive: bytes estimate exceeds the "
                            "physical roof (overcounted fusion operands); "
                            "real traffic lies between io_bytes_floor and "
                            "this upper bound")
                    elif pct >= 60.0:
                        entry["bound"] = (
                            "memory-bound at the measured FPS (bytes "
                            "estimate within estimate error of the HBM "
                            "roof)")
                    else:
                        entry["bound"] = "not memory-bound at the measured FPS"
            except Exception as exc:  # noqa: BLE001 — flops remain valid
                entry["tpu_bytes_error"] = str(exc)[:200]
        entries[key] = entry
        print(f"{key}: {entry['flops_per_frame'] / 1e9:.2f} GFLOP/frame, "
              f"mfu={entry.get('mfu_vs_bf16_peak', float('nan')):.5f}, "
              f"hbm={entry.get('hbm_GBps_at_fps', float('nan')):.1f} GB/s",
              flush=True)

    out = {
        "method": {
            "flops": "XLA cost analysis of the CPU-compiled XLA-impl "
                     "per-frame graph; MFU = flops*fps/peak (valid for "
                     "every impl of the same math)",
            "hbm": "TPU compiler bytes-accessed of the executable(s) the "
                   "FPS was measured on, summed over the deployed chain; "
                   "io_bytes_floor = executable inputs+outputs only.  "
                   "Never derived from the CPU graph (the r4 record did, "
                   "yielding impossible 12-25 TB/s figures).",
        },
        "peak_assumed": {"chip": "TPU v5e (v5 lite)",
                         "bf16_flops": V5E_PEAK_BF16,
                         "hbm_bytes_per_s": V5E_HBM_BW,
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
