"""Run the classical engine over Middlebury scene(s).

Parity with the reference's ``scripts/run_middlebury_pipeline.py``: each
scene directory (``im0.png``/``im1.png``/``calib.txt``) runs through the
pipeline with disparity + context-frame hooks.  Scenes run sequentially —
the engine itself owns the chip; host-side hook IO overlaps via the runner's
thread pool.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.pipeline import (DepthEstimationPipeline,
                                 extract_config_from_camera,
                                 run_depth_estimation_pipeline)
from stereo_tpu.pipeline.camera import MiddleburyStereoCamera
from stereo_tpu.pipeline.hooks import (ContextFrameSaver,
                                       DisparityMapCompletionLogger,
                                       DisparityMapSaver)


def scene_dirs(root: str):
    if os.path.exists(os.path.join(root, "calib.txt")):
        return [root]
    return sorted(os.path.join(root, d) for d in os.listdir(root)
                  if os.path.exists(os.path.join(root, d, "calib.txt")))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--middlebury-dir", required=True,
                        help="a scene dir or a directory of scene dirs")
    parser.add_argument("--save-dir", default="results/middlebury")
    args = parser.parse_args()

    for scene in scene_dirs(args.middlebury_dir):
        name = os.path.basename(os.path.normpath(scene))
        print(f"Processing scene: {name}")
        camera = MiddleburyStereoCamera(scene)
        config = extract_config_from_camera(camera)
        pipeline = DepthEstimationPipeline(config)
        run_depth_estimation_pipeline(camera, pipeline, [
            DisparityMapCompletionLogger(),
            DisparityMapSaver(os.path.join(args.save_dir, name)),
            ContextFrameSaver(os.path.join(args.save_dir, name)),
        ])


if __name__ == "__main__":
    main()
