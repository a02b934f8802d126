"""Generate the committed demo artifacts under ``results/demo/``.

Two scenarios, mirroring the reference's published demo media
(``/root/reference/README.md:49-63`` embeds result videos; this repo commits
still frames the same way a reader would inspect them):

1. **Middlebury stereo pair** (the reference's own ``src/python/data``
   sample): classical engine disparity at 1080p, saved as an 8-bit
   grayscale PNG normalized over the configured disparity range.
2. **Single-view synthetic scene** (depth-prior family): left view, the
   Deep3D-synthesized right view, GT disparity, and the disparity computed
   by a chosen backend from (left, synthesized right) — one grid image.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()   # TPU-tunnel compiles are slow


def _save_gray(path: str, array: np.ndarray, lo: float, hi: float) -> None:
    from PIL import Image

    scaled = np.clip((array - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
    Image.fromarray((scaled * 255.0 + 0.5).astype(np.uint8)).save(path)


def middlebury_demo(out_dir: str, data_dir: str) -> None:
    from PIL import Image

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import ClassicalStereoEngine

    left = np.asarray(Image.open(os.path.join(data_dir, "im0.png")),
                      np.float32).transpose(2, 0, 1)
    right = np.asarray(Image.open(os.path.join(data_dir, "im1.png")),
                       np.float32).transpose(2, 0, 1)
    cfg = MatchingConfig()          # Middlebury defaults: 1080p, 75..262
    engine = ClassicalStereoEngine(cfg)
    disparity = np.asarray(engine.compute_disparity_map(left, right))
    _save_gray(os.path.join(out_dir, "middlebury_disparity.png"), disparity,
               cfg.min_disparity, cfg.max_disparity)
    print(f"middlebury: mean={disparity.mean():.2f} "
          f"in-range={((disparity >= 75) & (disparity <= 262)).mean():.4f}")


def single_view_demo(out_dir: str, backend_name: str, seed: int) -> None:
    import jax

    from stereo_tpu.pipeline import DepthEstimationPipeline
    from stereo_tpu.core.config import PipelineConfig
    from stereo_tpu.train.synthetic import synthetic_stereo_scene
    from stereo_tpu.utils.image_io import save_image_grid

    # Scene shape = Deep3D's native operating shape (384x1280 since r3): at
    # other shapes the wrapper's resize rescales scene disparities outside
    # the model's 65-channel range.
    h, w = 384, 1280
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
    left, right, gt, _ = jax.jit(
        synthetic_stereo_scene, static_argnums=(1, 2, 5, 6, 7)
    )(key, h, w, 6.0, 58.0, 6, True, True)
    left = np.asarray(left)

    config = PipelineConfig(image_shape=(h, w), min_disparity=0,
                            max_disparity=64,
                            stereo_matching_backend=backend_name)
    pipeline = DepthEstimationPipeline(config)
    result = pipeline.process(left, None)        # right=None -> RVS path
    pred = np.asarray(result.disparity_map)
    synth_right = np.asarray(result.right_image)

    d_lo, d_hi = 0.0, 64.0
    gt_img = np.repeat(np.clip((np.asarray(gt) - d_lo) / (d_hi - d_lo), 0, 1)
                       [None] * 255.0, 3, axis=0)
    pred_img = np.repeat(np.clip((pred - d_lo) / (d_hi - d_lo), 0, 1)
                         [None] * 255.0, 3, axis=0)
    save_image_grid(
        [left, np.asarray(right), synth_right, gt_img, pred_img],
        os.path.join(out_dir, f"single_view_{backend_name}.png"))
    err = np.abs(pred - np.asarray(gt))
    print(f"single-view {backend_name}: MAE={err.mean():.3f}px "
          f"D1={((err > 3) & (err > 0.05 * np.asarray(gt))).mean():.4f}")
    print("grid rows: left | real right | synthesized right | GT disparity "
          "| predicted disparity")


def video_demo(out_dir: str, backend_name: str, seed: int, n_frames: int,
               fps: int, drive_speed: float) -> None:
    """Single-view DRIVE video (VERDICT r4 #7 — the reference's published
    evidence is demo videos, ``README.md:49-63``): a laterally tracking
    camera through one synthetic scene (true per-layer motion parallax,
    ``train.synthetic.synthetic_stereo_scene(camera_t=...)``), each frame
    run left-view-only through the pipeline, streamed into an mp4 by
    ``ContextVideoSaver`` (left | synthesized right | disparity)."""
    from stereo_tpu.core.config import PipelineConfig
    from stereo_tpu.pipeline import (DepthEstimationPipeline,
                                     run_depth_estimation_pipeline)
    from stereo_tpu.pipeline.camera import SyntheticStereoCamera
    from stereo_tpu.pipeline.hooks import (ContextVideoSaver,
                                           DisparityMapCompletionLogger)

    h, w = 384, 1280        # Deep3D's native operating shape
    camera = SyntheticStereoCamera(
        n_frames=n_frames, height=h, width=w, depth_prior=True,
        return_right_view=False, seed=seed, drive_speed=drive_speed)
    config = PipelineConfig(image_shape=(h, w), min_disparity=0,
                            max_disparity=64,
                            stereo_matching_backend=backend_name)
    pipeline = DepthEstimationPipeline(config)
    path = os.path.join(out_dir, f"single_view_drive_{backend_name}.mp4")
    hooks = [ContextVideoSaver(path, fps), DisparityMapCompletionLogger()]
    run_depth_estimation_pipeline(camera, pipeline, hooks)
    size = os.path.getsize(path)
    print(f"video: {path} ({n_frames} frames @ {fps} fps, {size/1e6:.2f} MB)")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default="results/demo")
    parser.add_argument("--middlebury-dir",
                        default="/root/reference/src/python/data")
    parser.add_argument("--backend", default="gwcnet")
    parser.add_argument("--seed", type=int, default=20260817)
    parser.add_argument("--skip-middlebury", action="store_true")
    parser.add_argument("--video", action="store_true",
                        help="write the single-view drive mp4 (see "
                             "video_demo)")
    parser.add_argument("--video-frames", type=int, default=48)
    parser.add_argument("--video-fps", type=int, default=12)
    parser.add_argument("--drive-speed", type=float, default=0.06,
                        help="baselines of lateral camera motion per frame")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    if not args.skip_middlebury and os.path.isdir(args.middlebury_dir):
        middlebury_demo(args.out_dir, args.middlebury_dir)
    single_view_demo(args.out_dir, args.backend, args.seed)
    if args.video:
        video_demo(args.out_dir, args.backend, args.seed, args.video_frames,
                   args.video_fps, args.drive_speed)


if __name__ == "__main__":
    main()
