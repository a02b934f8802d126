"""Synthetic evaluation camera: procedural stereo scenes with exact GT.

The reference's evaluation harness needs KITTI drives + Velodyne scans on
disk (``scripts/evaluate_depth_estimation_pipeline.py:16-70``); none ship in
this container.  This camera streams scenes from the on-device generator
(``stereo_tpu.train.synthetic``) through the SAME pipeline/metric path, so
the end-to-end accuracy gate (D1 / Threshold / MAE) can actually run — and
the GT is exact by construction rather than projected from lidar.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from .camera import EvaluationCamera


class SyntheticStereoCamera(EvaluationCamera):
    """Streams ``n_frames`` generated scenes as (left, right, gt) triplets.

    ``seed`` selects the scene set — use different seeds for train-time
    validation vs held-out evaluation.  With ``return_right_view=False`` the
    right view is withheld and the pipeline synthesizes it (RVS path).

    ``depth_prior`` selects the scene family (see
    ``train.synthetic.synthetic_stereo_scene``): ``False`` gives scenes with
    appearance-INDEPENDENT layer disparities — the right test for stereo
    *matching*, but information-theoretically unsolvable for single-view
    synthesis; ``True`` gives KITTI-like scenes whose appearance predicts
    depth, the fair family for evaluating the RVS path.
    """

    def __init__(self, n_frames: int = 8, height: int = 256,
                 width: int = 512, min_scene_disparity: float = 6.0,
                 max_scene_disparity: float = 58.0,
                 disparity_boundaries: Tuple[int, int] = (0, 64),
                 return_right_view: bool = True, seed: int = 1234,
                 focal_length: float = 720.0, baseline: float = 0.54,
                 depth_prior: bool = False, drive_speed: float = 0.0):
        self._n = n_frames
        self._h, self._w = height, width
        self._dmin, self._dmax = min_scene_disparity, max_scene_disparity
        self._bounds = disparity_boundaries
        self._return_right = return_right_view
        self._seed = seed
        self._f, self._b = focal_length, baseline
        self._depth_prior = depth_prior
        # drive mode: one fixed scene layout, the camera rig tracking
        # laterally by ``drive_speed`` baselines per frame (true motion
        # parallax — the demo-video scenario); 0.0 keeps the original
        # independent-scene-per-frame behavior.
        self._drive_speed = drive_speed

    def focal_length(self) -> float:
        return self._f

    def baseline(self) -> float:
        return self._b

    def get_image_shape(self) -> Tuple[int, int]:
        return (self._h, self._w)

    def get_disparity_boundaries(self) -> Tuple[int, int]:
        return self._bounds

    def _scene(self, index: int):
        import jax

        from ...train.synthetic import synthetic_stereo_scene

        if self._drive_speed:
            key = jax.random.PRNGKey(self._seed)       # one scene layout
            camera_t = index * self._drive_speed
        else:
            key = jax.random.fold_in(jax.random.PRNGKey(self._seed), index)
            camera_t = 0.0
        left, right, gt = jax.jit(
            synthetic_stereo_scene, static_argnums=(1, 2, 5, 6, 7)
        )(key, self._h, self._w, self._dmin, self._dmax, 6,
          self._depth_prior, False, camera_t)
        return (np.asarray(left), np.asarray(right), np.asarray(gt))

    def stream_image_pairs(self) -> Iterator[
            Tuple[np.ndarray, Optional[np.ndarray]]]:
        for i in range(self._n):
            left, right, _ = self._scene(i)
            yield left, (right if self._return_right else None)

    def stream_image_pairs_with_gt_disparity(self) -> Iterator[
            Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]]:
        for i in range(self._n):
            left, right, gt = self._scene(i)
            yield left, (right if self._return_right else None), gt
