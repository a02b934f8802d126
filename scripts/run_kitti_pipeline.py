"""Run the depth-estimation pipeline over a KITTI drive with every backend.

Parity with the reference's ``scripts/run_kitti_pipeline.py``: streams a
drive through each selected backend with frame + video hooks; the per-
backend video fps map mirrors the reference's measured rates (``:10-14``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.pipeline import (DepthEstimationPipeline,
                                 extract_config_from_camera,
                                 run_depth_estimation_pipeline,
                                 run_depth_estimation_pipeline_batched)
from stereo_tpu.pipeline.camera import KittiSingleViewCamera
from stereo_tpu.pipeline.hooks import (ContextFrameSaver, ContextVideoSaver,
                                       DisparityMapCompletionLogger)

BACKEND_VIDEO_FPS = {"classical": 30, "gwcnet": 6, "msnet3d": 4, "msnet2d": 6}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--drive-dir", required=True,
                        help="KITTI raw drive directory (contains image_02/)")
    parser.add_argument("--save-dir", default="results/kitti")
    parser.add_argument("--backends", nargs="+",
                        default=["classical", "gwcnet", "msnet3d"])
    parser.add_argument("--use-right-view", action="store_true",
                        help="feed the real right view instead of RVS")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="batch frames through the vmapped engine")
    args = parser.parse_args()

    for backend in args.backends:
        camera = KittiSingleViewCamera(args.drive_dir,
                                       return_right_view=args.use_right_view)
        config = extract_config_from_camera(camera).update(
            stereo_matching_backend=backend)
        pipeline = DepthEstimationPipeline(config)
        hooks = [
            DisparityMapCompletionLogger(),
            ContextFrameSaver(os.path.join(args.save_dir, backend)),
            ContextVideoSaver(os.path.join(args.save_dir, backend,
                                           f"{backend}.mp4"),
                              fps=BACKEND_VIDEO_FPS.get(backend, 10)),
        ]
        if args.batch_size > 1:
            run_depth_estimation_pipeline_batched(camera, pipeline,
                                                  args.batch_size, hooks)
        else:
            run_depth_estimation_pipeline(camera, pipeline, hooks)


if __name__ == "__main__":
    main()
