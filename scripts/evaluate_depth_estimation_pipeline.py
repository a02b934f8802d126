"""Evaluate every backend x RVS combination over KITTI drives.

Parity with the reference's ``scripts/evaluate_depth_estimation_pipeline.py``
(``:16-70``): grid over drives x {RVS on/off} x backends, the six metrics
(D1, Threshold_1/2/3/5, MAE) against Velodyne ground truth, JSON dump to a
timestamped file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()   # DNN compiles over the TPU tunnel are slow

from stereo_tpu.pipeline import (DepthEstimationPipeline,
                                 extract_config_from_camera,
                                 run_depth_estimation_pipeline_evaluation)
from stereo_tpu.pipeline.camera import KittiSingleViewCamera
from stereo_tpu.pipeline.metrics import default_metrics
from stereo_tpu.utils.paths import timestamp_folder_name


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--drive-dirs", nargs="+", default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="evaluate on held-out generated scenes with "
                             "exact GT (no KITTI data needed)")
    parser.add_argument("--n-frames", type=int, default=8,
                        help="synthetic mode: frames per evaluation")
    parser.add_argument("--image-shape", nargs=2, type=int,
                        default=[384, 1280],
                        help="synthetic mode: (H, W).  Default is the "
                             "reference's native KITTI operating point — "
                             "evaluating a native-resolution Deep3D "
                             "checkpoint at a SMALLER shape silently "
                             "compresses its expressible disparity range "
                             "(65 shift channels cover only 64 * W_eval / "
                             "W_model px after the wrapper resize) and "
                             "reads as catastrophic rvs_on D1")
    parser.add_argument("--seed", type=int, default=20260817,
                        help="synthetic mode: held-out scene seed")
    parser.add_argument("--backends", nargs="+",
                        default=["classical", "gwcnet", "msnet3d"])
    parser.add_argument("--rvs", nargs="+", default=["off", "on"],
                        choices=["off", "on"],
                        help="evaluate with the real right view (off) and/or "
                             "the synthesized one (on)")
    parser.add_argument("--rvs-checkpoint", default=None,
                        help="Deep3D .npz for the rvs_on arms (default: the "
                             "committed weights); used by the probability-"
                             "volume-resolution ablation")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="precision of the neural paths (DNN backends + "
                             "right-view synthesis) — the accuracy gate for "
                             "the bf16 speed arms")
    parser.add_argument("--output-dir", default="results/evaluation")
    parser.add_argument("--only-one", action="store_true",
                        help="one frame per drive (smoke run)")
    args = parser.parse_args()
    if not args.synthetic and not args.drive_dirs:
        parser.error("--drive-dirs is required without --synthetic")

    def make_camera(drive, rvs):
        if args.synthetic:
            from stereo_tpu.pipeline.camera import SyntheticStereoCamera

            # The rvs_on arm runs on depth-prior scenes (appearance predicts
            # depth, as on KITTI); random-disparity scenes are unsolvable
            # from one view, so they would measure the scene family, not the
            # synthesis network.
            return SyntheticStereoCamera(
                n_frames=(1 if args.only_one else args.n_frames),
                height=args.image_shape[0], width=args.image_shape[1],
                return_right_view=(rvs == "off"), seed=args.seed,
                depth_prior=(rvs == "on"))
        return KittiSingleViewCamera(drive, return_right_view=(rvs == "off"),
                                     only_one=args.only_one)

    drives = args.drive_dirs if not args.synthetic else ["synthetic"]
    results = {}
    shared_synthesis = None     # one Deep3D instance (and ONE ~268 MB
    # parameter upload) for the whole rvs_on grid instead of per-backend
    for drive in drives:
        drive_key = os.path.basename(os.path.normpath(drive))
        for rvs in args.rvs:
            for backend in args.backends:
                camera = make_camera(drive, rvs)
                config = extract_config_from_camera(camera).update(
                    stereo_matching_backend=backend,
                    rvs_checkpoint=args.rvs_checkpoint,
                    compute_dtype=args.compute_dtype)
                if rvs == "on" and shared_synthesis is None:
                    from stereo_tpu.synthesis import RightViewSynthesis

                    shared_synthesis = RightViewSynthesis(
                        output_shape=camera.get_image_shape(),
                        compute_dtype=config.compute_dtype,
                        checkpoint_dir=args.rvs_checkpoint)
                pipeline = DepthEstimationPipeline(
                    config,
                    synthesis=(shared_synthesis if rvs == "on" else None))
                key = f"{drive_key}/rvs_{rvs}/{backend}"
                print(f"=== {key}")
                results[key] = run_depth_estimation_pipeline_evaluation(
                    camera, pipeline, default_metrics())
                print(json.dumps(results[key], indent=2))

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir,
                            f"evaluation_{timestamp_folder_name()}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
